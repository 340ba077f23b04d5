#!/usr/bin/env bash
# Full self-supervised cycle (the reference's MagicPoint -> SuperPoint ->
# SuperGlue recipe, README.md:63-157) on the PHOTO dataset:
#
#   1. synthetic-shapes detector pretrain   (cli.train_superpoint --synthetic)
#   2. homographic-adaptation pseudo-labels (cli.export_pseudo, 50 warps)
#   3. detector+descriptor retrain on pseudo-labels (cli.train_superpoint)
#   4. SuperGlue training on warped pairs   (cli.train_superglue)
#   5. evaluation of BASELINE configs 3/4   (cli.evaluate --configs sp spsg)
#
# Stage 1 is assumed done (runs/sp_synth_tpu); pass SKIP_PRETRAIN=0 to rerun.
# Each stage is resumable; logs land in runs/logs/.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p runs/logs

PHOTO=${PHOTO:-datasets/PHOTO}
PRETRAIN_DIR=${PRETRAIN_DIR:-runs/sp_synth_tpu}
RETRAIN_DIR=${RETRAIN_DIR:-runs/sp_photo}
SG_DIR=${SG_DIR:-runs/sg_photo}
LABELS=${LABELS:-runs/pseudo_photo}
RETRAIN_ITER=${RETRAIN_ITER:-10000}
SG_EPOCHS=${SG_EPOCHS:-20}
SG_FT_EPOCHS=${SG_FT_EPOCHS:-20}

if [ "${SKIP_PRETRAIN:-1}" != "1" ]; then
  python -m image_matching_tpu.cli.train_superpoint --synthetic \
    --run_dir "$PRETRAIN_DIR" --batch_size 32 --train_iter 30000 \
    --save_interval 500 --resume 2>&1 | tee -a runs/logs/cycle_pretrain.log
fi

# bank each stage's weights as a committable npz snapshot
python scripts/export_weights.py --kind sp \
  --checkpoint "$PRETRAIN_DIR/checkpoints" --out weights/sp_synth.npz

for task in train val; do
  python -m image_matching_tpu.cli.export_pseudo \
    --data_root "$PHOTO" --out "$LABELS" --task "$task" \
    --checkpoint weights/sp_synth.npz \
    --height 240 --width 320 --batch_size 8 \
    2>&1 | tee -a runs/logs/cycle_export.log
done

python -m image_matching_tpu.cli.train_superpoint \
  --data_root "$PHOTO" --labels "$LABELS" --run_dir "$RETRAIN_DIR" \
  --batch_size 32 --train_iter "$RETRAIN_ITER" --save_interval 500 \
  --init_weights weights/sp_synth.npz \
  --resume 2>&1 | tee -a runs/logs/cycle_retrain.log
python scripts/export_weights.py --kind sp \
  --checkpoint "$RETRAIN_DIR/checkpoints" --out weights/sp_photo.npz

python -m image_matching_tpu.cli.train_superglue \
  --data_root "$PHOTO" --sp_checkpoint weights/sp_photo.npz \
  --run_dir "$SG_DIR" --epochs "$SG_EPOCHS" --steps_per_epoch 500 \
  --batch_size 4 --resume 2>&1 | tee -a runs/logs/cycle_sg.log
python scripts/export_weights.py --kind sg \
  --checkpoint "$SG_DIR/checkpoints" --out weights/sg_photo.npz

# cosine-decay fine-tune: measured worth -0.06 px corner error and
# +22 inliers/pair over the constant-lr endpoint (BASELINE.md config 4)
python -m image_matching_tpu.cli.train_superglue \
  --data_root "$PHOTO" --sp_checkpoint weights/sp_photo.npz \
  --init_weights weights/sg_photo.npz --run_dir "${SG_DIR}_ft" \
  --epochs "$SG_FT_EPOCHS" --steps_per_epoch 500 --batch_size 4 \
  --cosine_decay_steps $((SG_FT_EPOCHS * 500)) \
  2>&1 | tee -a runs/logs/cycle_sg_ft.log
python scripts/export_weights.py --kind sg \
  --checkpoint "${SG_DIR}_ft/checkpoints" --out weights/sg_photo.npz

# hardening fine-tune: photometric asymmetry + subpixel keypoints +
# perspective warps (round-3: ref regime 0.59 -> 0.56 px, asym parity,
# hard-regime success 0.98 -> 1.00; see ROADMAP round-3 item 8)
python -m image_matching_tpu.cli.train_superglue \
  --data_root "$PHOTO" --sp_checkpoint weights/sp_photo.npz \
  --init_weights weights/sg_photo.npz --run_dir "${SG_DIR}_persp" \
  --photometric --subpixel --perspective_amplitude 0.15 \
  --epochs "$SG_FT_EPOCHS" --steps_per_epoch 500 --batch_size 4 \
  --cosine_decay_steps $((SG_FT_EPOCHS * 500)) \
  2>&1 | tee -a runs/logs/cycle_sg_persp.log
python scripts/export_weights.py --kind sg \
  --checkpoint "${SG_DIR}_persp/checkpoints" --out weights/sg_persp.npz

python -m image_matching_tpu.cli.evaluate --configs sp spsg \
  --sp_checkpoint weights/sp_photo.npz \
  --sg_checkpoint weights/sg_persp.npz \
  --texture photo --out EVAL_learned.json \
  2>&1 | tee -a runs/logs/cycle_eval.log
