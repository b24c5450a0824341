#!/bin/bash
# Where do the gb-CPML cycles go at 512^3 f32? Times the grid-blocked
# kernel with pieces of the absorbing update surgically disabled
# (FDTD_PROF_DISABLE, timing-only — physically wrong kernels) plus plan
# variants. Each case runs in its own subprocess so the import-time env
# flag and the lru_cached kernel builds cannot alias.
set -u
cd "$(dirname "$0")/.."
run() {
  local label="$1"; shift
  local dis="$1"; shift
  echo "=== $label (disable='$dis') $*"
  FDTD_PROF_DISABLE="$dis" timeout 1200 python tools/exp_gb.py "$@" 2>&1 \
    | grep -v -E "WARNING|experimental" | tail -5
}
run "baseline gb K=10 nb=2" ""            gb-10-2
run "gb K=8 nb=2 (h=8)"     ""            gb-8-2
run "no x-psi"              "xpsi"        gb-10-2
run "no strips"             "strips"      gb-10-2
run "no edgemask"           "edgemask"    gb-10-2
run "no psi at all"         "xpsi,strips" gb-10-2
run "bare stencil"          "xpsi,strips,edgemask" gb-10-2
