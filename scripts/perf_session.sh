#!/usr/bin/env bash
# Post-training perf session on the real TPU chip (single-tenant — run
# only when no trainer holds the chip). Produces the round's perf
# artifacts under runs/ and prints the headline bench line.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p runs

echo "== backbone per-stage probe" >&2
python scripts/probe_backbone.py 2>&1 | tee runs/probe_backbone.txt

echo "== entry-conv kernel vs XLA" >&2
python scripts/probe_entry_conv.py 2>&1 | tee runs/probe_entry_conv.txt

echo "== attention flash vs einsum (fwd + fwd/bwd)" >&2
python scripts/bench_attention.py 2>&1 | tee runs/attention_bench.txt

echo "== headline bench" >&2
python bench.py
