"""spark-submit shim: `spark-submit --py-files polaris_spark.zip cli_shim.py ...`"""

import sys

from polaris_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
