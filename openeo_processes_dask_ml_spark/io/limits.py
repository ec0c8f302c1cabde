"""Shared decode-limit exception for the pure-numpy codecs.

``ImageLimitError`` marks a DELIBERATE resource-cap rejection (the
``max_pixels`` decompression-bomb guard), as opposed to a corrupt or
unsupported payload. ``decode_image``'s decoder-order fallthrough
re-raises it immediately instead of handing the payload to PIL —
otherwise a hostile header would simply be retried under PIL's much
higher bomb limit, bypassing the cap (ADVICE r11).

Subclasses ``ValueError`` so callers treating any decode failure as
"skip this file" keep working unchanged.
"""


class ImageLimitError(ValueError):
    """Image exceeds a configured decode limit (e.g. ``max_pixels``)."""
