from . import cigar  # noqa: F401
