"""No-op loguru stand-in so reference modules import (loguru is not
installed in this image; the reference only uses it for logging)."""


class _Logger:
    def __getattr__(self, name):
        return lambda *a, **k: None


logger = _Logger()
