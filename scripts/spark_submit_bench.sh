#!/usr/bin/env bash
# The north_rule's submission contract: spark-submit --py-files with the
# engine packaged as a zip. Locally this runs the same bench the driver
# runs; on a cluster, swap --master.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CPUS="${SPARK_GRAFT_CPUS:-32}"
ZIP=/tmp/cees_pkg.zip

cd "$REPO"
rm -f "$ZIP"
zip -qr "$ZIP" calendar_event_entity_extraction_spark -x '*__pycache__*'

exec "$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')" \
  --master "local[$CPUS]" \
  --conf spark.sql.shuffle.partitions="$CPUS" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --py-files "$ZIP" \
  "$REPO/bench.py" "$@"
