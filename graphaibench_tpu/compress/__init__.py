from graphaibench_tpu.compress import cgr, hybrid, vbyte  # noqa: F401
from graphaibench_tpu.compress.cli import (  # noqa: F401
    compress_cmd,
    decompress_cmd,
    load_compressed,
    save_compressed,
    verify_cmd,
)
