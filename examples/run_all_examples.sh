#!/usr/bin/env bash
# Smoke-run the example matrix (CPU, float64). The reference's analogue is
# running each test_cases/<model>/*.py script by hand (README.md:119-127).
set -e
cd "$(dirname "$0")/.."
export GLIMS_PLATFORM=cpu GLIMS_X64=1
export XLA_FLAGS="--xla_force_host_platform_device_count=8"
for s in \
    examples/tumor_growth_2D_uniform.py \
    "examples/tumor_growth_2D_uniform_adjoint.py --n 15" \
    "examples/tumor_growth_2D_uniform_adjoint.py --n 12 --noise 0.02 --params 2" \
    examples/tumor_growth_2D_uniform_adjoint_noise.py \
    examples/tumor_growth_2D_uniform_adjoint_reloaded.py \
    "examples/tumor_growth_2D_uniform_adjoint_custom_minimizer.py --n 15" \
    examples/tumor_growth_2D_uniform_reload.py \
    examples/tumor_growth_2D_subdomains.py \
    examples/comparison_2D_atlas.py \
    examples/comparison_3D_atlas.py \
    examples/tumor_growth_3D_atlas_sharded.py \
    examples/brain_2D_atlas_reduced_domain_adjoint.py \
    examples/atlas_optimization_workflow.py \
    examples/patient_optimization_workflow.py; do
  echo "== $s"
  python $s
done
echo "ALL EXAMPLES OK"
