from .constants import *  # noqa: F401,F403
from .headers import (  # noqa: F401
    HEADER_SIZE,
    LINE_HEADERS_SIZE,
    decode_length_header,
    decode_line_headers,
    encode_length_header,
)
from .lines import (  # noqa: F401
    VcfValidationError,
    decode_data_line,
    encode_data_line,
    split_terms,
)
from .vcf import (  # noqa: F401
    VcfcHeader,
    VcfcSchema,
    compress_bytes,
    decompress_bytes,
    parse_metadata_headers,
)
