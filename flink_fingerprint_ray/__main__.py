"""``python -m flink_fingerprint_ray`` — the ray-job-submit entry point."""
from .cli import main

raise SystemExit(main())
