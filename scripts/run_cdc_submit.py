"""spark-submit entrypoint for the CDC replay (north rule: "run via
spark-submit --py-files on multi-executor clusters").

    python scripts/package_pyfiles.py   # builds dist/fec_cn_support_etl_spark.zip
    spark-submit --master <cluster> \
      --py-files dist/fec_cn_support_etl_spark.zip \
      scripts/run_cdc_submit.py --wal ... --table ... [runner args]

Inside spark-submit the session already exists; runner.get_spark
getOrCreate() attaches to it.
"""

import sys

from fec_cn_support_etl_spark.cdc.runner import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
