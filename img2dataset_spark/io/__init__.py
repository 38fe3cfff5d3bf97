"""IO layer: scheme-dispatching filesystem (local / memory / fsspec)."""
