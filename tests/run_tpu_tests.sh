#!/bin/sh
# On-device kernel test lane (VERDICT r1 item 4): runs every `tpu`-marked test
# non-interpreted on the real TPU. The default pytest run forces 8 virtual CPU
# devices and deselects these (pyproject addopts -m 'not tpu').
#
#     sh tests/run_tpu_tests.sh [extra pytest args]
#
# First-compile of the kernels takes ~30s each; the persistent compile cache
# makes reruns fast.
set -e
cd "$(dirname "$0")/.."
TPURPN_TPU_TESTS=1 exec python -m pytest tests/ -m tpu -v "$@"
