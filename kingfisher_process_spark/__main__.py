"""``python -m kingfisher_process_spark`` — see cli.py."""

import sys

from kingfisher_process_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
