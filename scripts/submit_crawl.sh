#!/usr/bin/env bash
# Deploy the engine via spark-submit --py-files (BASELINE.json north_rule's
# deployment shape): zip the package, ship it to executors, run the crawl
# CLI as the driver application.
#
# Usage: scripts/submit_crawl.sh [--master spark://...|local[8]] [crawl args...]
#   scripts/submit_crawl.sh --master 'local[8]' crawl --hosts 5 --pages 6 \
#       --seeds 3 --target 20 --waves 12
#
# On a real cluster, point --master at YARN/k8s/standalone; the session
# factory defers to the submitted master (session.py). Executors import
# the package from the shipped zip — no repo checkout needed on workers.

set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
PKG=distributed_web_search_engine_crawler_indexing_pagerank__spark

MASTER="local[8]"
if [[ "${1:-}" == "--master" ]]; then
  MASTER="$2"
  shift 2
fi

DIST="$REPO/dist"
mkdir -p "$DIST"
ZIP="$DIST/$PKG.zip"
(cd "$REPO" && rm -f "$ZIP" && zip -qr "$ZIP" "$PKG" -x '*__pycache__*')

exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  "$REPO/scripts/submit_driver.py" "$@"
