#!/usr/bin/env bash
# Ship the pipeline as spark-submit --py-files (north-rule packaging).
# Usage: scripts/submit_pipeline.sh --scale tiny --out /tmp/submit_out [--buckets 4]
# On a cluster: replace --master with yarn/k8s and point --input at the
# Iceberg transcripts table (iceberg:<catalog.table>).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=/tmp/logparserhelper_spark.zip
rm -f "$ZIP"
(cd "$REPO" && python -c "
import zipfile, os
with zipfile.ZipFile('$ZIP', 'w') as z:
    for root, _, files in os.walk('logparserhelper_spark'):
        for f in files:
            if f.endswith(('.py', '.json')):
                p = os.path.join(root, f)
                z.write(p, p)
print('packaged', '$ZIP')
")
exec spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-32}]" \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-32}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --py-files "$ZIP" \
  "$REPO/scripts/pipeline_job.py" "$@"
