"""spark-submit driver script for the standalone server runtime.

    spark-submit --master <cluster> --py-files dist/debezium_spark.zip \
        tools/server_main.py --config application.properties

Deliberately import-only: the package arrives via --py-files, the job logic
lives in debezium_spark.server (the Debezium Server analogue, SURVEY §3.3).
"""

import sys

from debezium_spark.server import main

if __name__ == "__main__":
    sys.exit(main())
