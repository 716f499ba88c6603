#!/bin/bash
# Render and run every example INI (mirrors the reference's
# python/run_all_example_ini.sh workflow through bin/mbpol_builder).
# Usage: bash examples/run_all_example_ini.sh [workdir]
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
REPO="$(dirname "$HERE")"
WORK="${1:-$(mktemp -d)}"
cd "$WORK"
cp "$HERE"/water14_cluster.pdb "$HERE"/water256_bulk.pdb . 2>/dev/null || true
for f in "$HERE"/example_ini/*.ini; do
    name=$(basename "$f" .ini)
    PYTHONPATH="$REPO" python "$REPO/bin/mbpol_builder" "$f" "$name.py"
done
for f in *.py; do
    echo "== $f"
    PYTHONPATH="$REPO" python "$f" 2>&1 | tail -2
done
echo "all example INIs ran in $WORK"
