"""``python -m scalce_tpu`` == the CLI (mirrors the reference's single
``scalce`` binary surface)."""

import sys

from scalce_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
