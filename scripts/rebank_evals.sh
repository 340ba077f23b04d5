#!/bin/bash
# Re-bank every quality artifact at HEAD (VERDICT round-4 item 3).
# Flagship learned config: sp_photo + sg_persp (e05005e established
# sg_persp as the better checkpoint across all three regimes).
# Serialized: one TPU chip.
set -ex
cd /root/repo
mkdir -p runs/logs

EV="python -m image_matching_tpu.cli.evaluate"
CKPT="--sp_checkpoint weights/sp_photo.npz --sg_checkpoint weights/sg_persp.npz"

# 1. BASELINE configs 3/4 at the default (reference) regime — the cycle's
#    eval stage output, now with the flagship sg_persp weights.
$EV --configs sp spsg $CKPT --out EVAL_learned.json \
  2>&1 | tee runs/logs/rebank_learned.log

# 2. Photometric-asymmetry regime, all four configs.
$EV --configs sift orb sp spsg $CKPT --photo_asym \
  --out EVAL_asym_regime.json 2>&1 | tee runs/logs/rebank_asym.log

# 3. Hard regime: perspective GT + photometric asym, homography fit.
$EV --configs sift orb sp spsg $CKPT --gt perspective --photo_asym \
  --ransac_model homography --out EVAL_hard_regime.json \
  2>&1 | tee runs/logs/rebank_hard.log

echo REBANK_DONE
