"""Error taxonomy for tpu_blosc.

Mirrors the reference's eight sentinel errors (reference: blosc.go:123-149)
as a typed exception hierarchy so callers can catch programmatically
(the Python analogue of Go's ``errors.Is``).
"""

from __future__ import annotations


class BloscError(Exception):
    """Base class for every tpu_blosc error."""


class InvalidDataError(BloscError):
    """The compressed data is malformed or corrupted (≙ ErrInvalidData)."""


class InvalidHeaderError(BloscError):
    """The Blosc header is missing or malformed (≙ ErrInvalidHeader)."""


class InvalidVersionError(BloscError):
    """Unsupported Blosc format version (≙ ErrInvalidVersion)."""


class InvalidCodecError(BloscError):
    """The codec specified is not supported or registered (≙ ErrInvalidCodec)."""


class SizeMismatchError(BloscError):
    """Decompressed size does not match the expected size (≙ ErrSizeMismatch)."""


class DataTooLargeError(BloscError):
    """Input data exceeds the maximum supported size (≙ ErrDataTooLarge).

    The reference declares this sentinel but never raises it (sizes silently
    wrap at uint32).  We *do* raise it: any input whose frame could not be
    represented in the uint32 header fields is rejected instead of producing
    a corrupt frame.
    """


class CompressionFailedError(BloscError):
    """The compression operation failed (≙ ErrCompressionFailed)."""


class DecompressionFailedError(BloscError):
    """The decompression operation failed (≙ ErrDecompressionFailed)."""
