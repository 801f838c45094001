#!/usr/bin/env bash
# Run the headline benchmark on TPU hardware (out-of-band from CI —
# the reference's equivalent of its docker-compose'd integration jobs).
set -euo pipefail
cd "$(dirname "$0")/.."
python bench.py
