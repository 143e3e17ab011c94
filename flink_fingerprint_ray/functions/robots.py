"""Robots Exclusion Protocol (RFC 9309) parsing + URL matching.

Crawl curation's first gate: per-host ``robots.txt`` bodies are parsed
into (host, path_prefix, allow, priority) rules, and URLs are admitted by
the RFC's group-selection and longest-match semantics:

- lines are ``directive: value`` records; ``#`` comments stripped
- consecutive ``User-agent`` lines open a group; a group's rules apply to
  the agents naming it; matching prefers the most specific agent token,
  falling back to ``*`` (this engine crawls as an unlisted agent, so the
  ``*`` groups apply — agent-specific groups are parsed and kept so a
  caller can select another product token)
- among matching rules the LONGEST path prefix wins; on equal length
  ``Allow`` beats ``Disallow``; no matching rule means allowed
- empty ``Disallow:`` means allow-all (parsed, yields no rule)

Parsing is whole-column vectorized (polars line explode + window group
ids); matching is one vectorized prefix mask per rule — right for the
real-world shape (rules-per-host is small; the rule table broadcasts via
``ray.put`` while the URL stream flows through map_batches).  A 100k+
rule table would swap the rule loop for a reversed-prefix sorted-array
``searchsorted``, the same upgrade path as the blocklist filter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .fingerprint import _polars


def parse_robots(hosts: list[str], bodies: list[str],
                 agent: str = "*") -> "object":
    """Parse robots.txt bodies → polars-free dict of numpy rule arrays
    for ``agent`` (with ``*`` fallback per RFC group selection):
    {"host": ..., "prefix": ..., "allow": ..., "length": ...}."""
    pl = _polars()
    df = pl.DataFrame({"host": pl.Series(hosts, dtype=pl.String),
                       "body": pl.Series(bodies, dtype=pl.String)})
    lines = (
        df.with_columns(pl.col("body").str.split("\n").alias("line"))
        .drop("body").explode("line")
        # strip comments + whitespace; keep 'directive: value'
        .with_columns(pl.col("line").str.replace(r"#.*$", "")
                      .str.strip_chars().alias("line"))
        .filter(pl.col("line") != "")
        .with_columns(
            pl.col("line").str.extract(r"(?i)^([a-z-]+)\s*:", 1)
            .str.to_lowercase().alias("directive"),
            pl.col("line").str.extract(r"^[A-Za-z-]+\s*:\s*(.*)$", 1)
            .str.strip_chars().alias("value"))
        .drop_nulls("directive")
    )
    # group id: a User-agent line that does NOT directly follow another
    # User-agent line starts a new group (consecutive UA lines share one)
    lines = lines.with_columns(
        (pl.col("directive") == "user-agent").alias("is_ua"))
    lines = lines.with_columns(
        (pl.col("is_ua")
         & ~pl.col("is_ua").shift(1, fill_value=False).over("host"))
        .cast(pl.Int64).cum_sum().over("host").alias("gid"))
    # each group's agent tokens; a group matches if it names `agent` or '*'
    ua = (lines.filter(pl.col("is_ua"))
          .with_columns(pl.col("value").str.to_lowercase().alias("ua"))
          .group_by(["host", "gid"])
          .agg(((pl.col("ua") == agent.lower()).any()).alias("exact"),
               ((pl.col("ua") == "*").any()).alias("star")))
    rules = (
        lines.filter(pl.col("directive").is_in(["allow", "disallow"])
                     & (pl.col("value") != ""))
        .join(ua, on=["host", "gid"], how="inner")
    )
    # prefer groups naming the agent exactly; else the '*' groups
    if agent != "*" and rules.filter(pl.col("exact")).height > 0:
        rules = rules.filter(pl.col("exact"))
    else:
        rules = rules.filter(pl.col("star") | pl.col("exact"))
    return {
        "host": rules["host"].to_numpy().astype(object),
        "prefix": rules["value"].to_numpy().astype(object),
        "allow": (rules["directive"] == "allow").to_numpy(),
        "length": rules["value"].str.len_chars().to_numpy().astype(np.int64),
    }


def robots_allowed(rules: dict, host_col, path_col) -> np.ndarray:
    """Vectorized RFC 9309 longest-match verdict for (host, path) rows:
    one prefix mask per rule; best match tracked by (length, allow) —
    Allow wins length ties via the +0.5 priority bump."""
    import pyarrow.compute as pc

    host = np.asarray(host_col.to_pandas() if hasattr(host_col, "to_pandas")
                      else host_col, dtype=object)
    n = len(host)
    best_len = np.full(n, -1.0)
    verdict_allow = np.ones(n, dtype=bool)  # no match -> allowed
    for h, p, a, ln in zip(rules["host"], rules["prefix"],
                           rules["allow"], rules["length"]):
        m = (host == h) & pc.starts_with(path_col, pattern=p) \
            .to_numpy(zero_copy_only=False)
        prio = float(ln) + (0.5 if a else 0.0)
        upd = m & (prio > best_len)
        best_len[upd] = prio
        verdict_allow[upd] = a
    return verdict_allow
