#!/bin/bash
# Smoke example (reference example_inference.sh): dock the vendored 3dpf
# complex.  Pass a trained run dir via SCORE_MODEL_DIR to use real weights;
# defaults to --random_weights so the example runs out of the box.
set -e
set -x

batch_size=8
samples_per_complex=4

model_args=(--random_weights)
if [ -n "$SCORE_MODEL_DIR" ]; then
  model_args=(--score_model_dir "$SCORE_MODEL_DIR")
  [ -n "$FILTERING_MODEL_DIR" ] && model_args+=(--filtering_model_dir "$FILTERING_MODEL_DIR")
fi

python inference.py \
  --protein_path example_data/3dpf_protein.pdb \
  --ligand example_data/3dpf_ligand.sdf \
  --complex_name 3dpf \
  --batch_size $batch_size \
  --samples_per_complex $samples_per_complex \
  --keep_local_structures --save_visualisation \
  "${model_args[@]}"
