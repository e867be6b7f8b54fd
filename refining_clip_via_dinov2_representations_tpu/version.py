"""Package version (reference `src/open_clip/version.py`)."""

__version__ = "0.2.0"
