#!/usr/bin/env bash
# One-command RD validation runway (see scripts/validate_rd.py):
#   ./scripts/validate_rd.sh /data/UVG /data/pth_weights
# or a no-asset pipeline exercise:
#   ./scripts/validate_rd.sh --dry-run
set -euo pipefail
cd "$(dirname "$0")/.."
if [ "${1:-}" = "--dry-run" ]; then
    exec python scripts/validate_rd.py --dry-run
fi
exec python scripts/validate_rd.py --uvg "$1" --weights "$2" "${@:3}"
