#!/usr/bin/env bash
# Bench wrapper whose FINAL stdout line is guaranteed to be the one-line
# bench JSON (round-5 verdict item 3): sbt appends its own "[success]
# Total time…" trailer after graft.Bench's output, which breaks any
# caller that parses the last stdout line. Run sbt, then re-emit the
# detail file graft.Bench wrote as the wrapper's last line.
#
# Usage: env knobs as for graft.Bench, e.g.
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 bash tools/bench.sh
set -o pipefail
cd "$(dirname "$0")/.."
sbt -batch "runMain graft.Bench"
rc=$?
if [ $rc -ne 0 ]; then exit $rc; fi
if [ ! -s bench/BENCH_LAST.json ]; then
  echo "bench/BENCH_LAST.json missing or empty" >&2
  exit 1
fi
cat bench/BENCH_LAST.json
echo
