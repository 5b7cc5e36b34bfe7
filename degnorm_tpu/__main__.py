"""``python -m degnorm_tpu`` — same entry as the ``degnorm-tpu`` console
script (reference degnorm/__main__.py:16)."""
import sys

from degnorm_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
