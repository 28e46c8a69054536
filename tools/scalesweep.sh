#!/usr/bin/env bash
# Scale-robustness sweep: replicate sf0.1 N-fold, run the query
# surface through graft.Verify, and hash-compare against the DuckDB
# oracle at that scale. Usage:
#
#   tools/scalesweep.sh <copies> [skip.csv]
#
#   copies    replication factor (5 = sf0.5, 10 = sf1, 20 = sf2, ...)
#   skip.csv  optional comma-separated query names to EXCLUDE — used
#             for the adjudicated output-bound / fixture-pathology
#             rows (docs/SCALING.md) whose TRUE result size grows
#             quadratically on a bit-identical replicated fixture.
#             Skips are named in the output; never silent.
#   --perturb (3rd arg) builds the PERTURBED fixture (per-copy text
#             rotation + embedding epsilon — near-dup pair counts stay
#             ~linear; see tools/mkscale.py), so the output-bound rows
#             can run WITHOUT skips and measure plan cost.
#
# Runs from the repo root. The fixture lands in target/sweep_<x>,
# Verify dumps in /tmp/verify_sweep_<x>.
set -euo pipefail
cd "$(dirname "$0")/.."

copies="${1:?usage: tools/scalesweep.sh <copies> [skip.csv] [--perturb]}"
skip="${2:-}"
perturb="${3:-}"
# a typo'd 3rd arg (--preturb, say) would label the fixture _perturb
# while mkscale.py silently builds a PLAIN one — corrupting the
# plan-vs-output methodology the flag exists for. Exact match or die.
[[ -z "$perturb" || "$perturb" == "--perturb" ]] || {
  echo "unknown 3rd arg: '$perturb' (only --perturb is accepted)" >&2; exit 2; }
dst="target/sweep_${copies}x${perturb:+_perturb}"
out="/tmp/verify_sweep_${copies}x${perturb:+_perturb}"

python3 tools/mkscale.py /root/testdata/sf0.1 "$dst" "$copies" $perturb

only_arg=""
if [[ -n "$skip" ]]; then
  # Verify takes the RUN list: complement the skip list against the
  # FULL registered query set (Verify --list), not the oracle keys —
  # a registered rows-only query (no oracle) must still run in the
  # sweep rather than be silently excluded
  sbt -batch "runMain graft.Verify --list /tmp/sweep_names.txt" >/dev/null
  only_arg=$(python3 - "$skip" <<'EOF'
import sys
registered = set(open("/tmp/sweep_names.txt").read().split())
assert registered, "Verify --list produced no names"
skip = set(sys.argv[1].split(","))
unknown = skip - registered
if unknown:
    sys.exit(f"unknown skip names: {sorted(unknown)}")
print(",".join(sorted(registered - skip)))
EOF
)
fi

sbt -batch "runMain graft.Verify $dst $out $only_arg" | tail -2
if [[ -n "$skip" ]]; then
  python3 tools/check.py "$dst" "$out" --skip "$skip"
else
  python3 tools/check.py "$dst" "$out"
fi
