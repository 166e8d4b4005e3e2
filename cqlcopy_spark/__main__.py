"""`python -m cqlcopy_spark` — the reference's CLI shape (main.go:45-50)."""

import sys

from cqlcopy_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
