"""``python -m rados_timestore_spark`` — see :mod:`.cli`."""

import sys

from rados_timestore_spark.cli import main

sys.exit(main())
