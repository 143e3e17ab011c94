from .store import WindowStateActor, StatePool, JoinStateActor  # noqa: F401
