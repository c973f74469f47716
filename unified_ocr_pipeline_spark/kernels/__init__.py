"""Pure-Python column kernels. No Spark imports allowed in this package.

These run inside Arrow-batched pandas UDF stages (one Python call per batch,
compiled regexes amortized per worker) and, identically, inside the sequential
oracle that produces byte-identity goldens.
"""

from .sniff import sniff_content_type
from .document import process_document, DocumentResult

__all__ = ["sniff_content_type", "process_document", "DocumentResult"]
