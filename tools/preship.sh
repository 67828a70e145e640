#!/usr/bin/env bash
# Pre-snapshot guard: NO commit that claims a green tree ships without the
# compiler having seen the WHOLE tree (main + test). Round 13's final
# snapshot added a test file with a nested block comment that had never
# been compiled — `sbt test` was red at HEAD for the entire judging
# session. Run this immediately before any end-of-round / snapshot commit;
# a non-zero exit is a STOP-SHIP.
#
# Usage: tools/preship.sh            # Test/compile only (~1-2 min warm)
#        tools/preship.sh --test     # full sbt test as well
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[preship] sbt Test/compile ..."
sbt -batch Test/compile

if [[ "${1:-}" == "--test" ]]; then
  echo "[preship] sbt test ..."
  sbt -batch test
fi

echo "[preship] OK — tree compiles; safe to snapshot"
