#!/bin/sh
# Full verification sweep: unit/integration tests, oracle parity at TWO
# scale factors, and physical-plan audits. The sf0.1 oracle pass exists
# because parity bugs can be scale-dependent: round 4 caught an inclusive
# session-merge boundary and a float rounding tie that sf0.01 never hits.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python tools/check_oracles.py
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/check_oracles.py
python tools/plan_audit.py
# the scaling gate (runtime-vs-SF exponents + explicit heavyweight
# ceilings) is ~12 min of timed runs and needs an IDLE machine — opt in:
if [ -n "$SPARK_GRAFT_SCALING" ]; then python tools/scaling_probe.py 3; fi
echo "ALL VERIFICATION PASSES GREEN"
