#!/usr/bin/env bash
# Build pipeline.zip for spark-submit --py-files (north-rule launch path).
#
#   ./scripts/package.sh
#   spark-submit --master <cluster> --py-files pipeline.zip \
#       --conf spark.sql.mapKeyDedupPolicy=LAST_WIN \
#       --conf spark.sql.session.timeZone=UTC \
#       --conf spark.sql.adaptive.enabled=true \
#       main.py --input <webpages table> --output <sink namespace>
#
# With an Iceberg catalog, additionally:
#   --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
#   --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
#   --conf spark.sql.catalog.lake.type=rest ...
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f pipeline.zip
(cd src && zip -qr ../pipeline.zip weblog_pipeline -x '*__pycache__*')
echo "wrote $(pwd)/pipeline.zip"
unzip -l pipeline.zip | tail -3
