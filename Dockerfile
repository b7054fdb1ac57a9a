# Runtime environment for garbage_classification_rca_tpu.
# TPU-native counterpart of the reference Dockerfile:1-17 (pytorch/pytorch
# base + pip list): here the base is plain Python and the accelerator stack
# is jax[tpu] over libtpu. torch stays CPU-only — it is used exclusively as
# a host-side checkpoint reader (.pth -> numpy) and test oracle.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml ./
COPY garbage_classification_rca_tpu ./garbage_classification_rca_tpu
COPY scripts ./scripts
COPY tools ./tools

RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        optax orbax-checkpoint einops numpy pillow pandas scikit-learn \
        matplotlib \
        torch --index-url https://download.pytorch.org/whl/cpu \
    && pip install --no-cache-dir -e .

# native host preprocessing builds lazily on first use (g++ above);
# force-build it now so runtime containers start warm
RUN python -c "from garbage_classification_rca_tpu.native import get_lib; get_lib()"

# see scripts/reference/<family>/<name>.sh for flag-exact equivalents of
# every reference SLURM launcher
CMD ["python", "-m", "garbage_classification_rca_tpu"]
