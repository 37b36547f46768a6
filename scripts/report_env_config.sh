#!/bin/bash
# Environment report — TPU equivalent of scripts/report_env_config.sh
# (python/conda/pip/nvidia-smi/torch-CUDA status → python/pip/TPU/JAX status).

echo "== python =="
which python; python -V
echo
echo "== pip (jax-related) =="
pip list 2>/dev/null | grep -iE "jax|flax|optax|orbax|chex|numpy" || true
echo
echo "== TPU devices =="
python - <<'EOF'
import jax
print("jax", jax.__version__)
print("backend:", jax.default_backend())
for d in jax.devices():
    print(" ", d, "—", getattr(d, "device_kind", "?"))
print("process", jax.process_index(), "of", jax.process_count())
EOF
