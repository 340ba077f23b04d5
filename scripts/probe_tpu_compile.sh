#!/bin/bash
# Sequence the TPU compile probes; per-piece timeout so a stall can't block.
cd /root/repo
for piece in matmul sp_fwd det_bwd desc_bwd pipeline train_step; do
  echo "=== $piece $(date +%H:%M:%S) ==="
  timeout "${PROBE_TIMEOUT:-2400}" python scripts/probe_tpu_compile.py "$piece"
  echo "=== $piece exit=$? $(date +%H:%M:%S) ==="
done
