# botsort_tpu runtime image for Cloud TPU VMs (v5e/v6e).
# The reference ships a CUDA 11.8 + TensorRT 8.5.3 image
# (reference Dockerfile); the TPU equivalent needs only the libtpu-enabled
# JAX wheel — no vendor engine toolchain, no GPU driver matrix.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential make libgl1 libglib2.0-0 \
    && rm -rf /var/lib/apt/lists/*

RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        flax orbax-checkpoint opencv-contrib-python-headless scipy pytest

WORKDIR /app
COPY . /app
RUN make -C native && pip install --no-cache-dir -e .

# Populate the persistent XLA compile cache at build time (optional):
# RUN python -m botsort_tpu.cli.warmup --resolutions 1080x1920

ENTRYPOINT ["python", "-m", "botsort_tpu.cli.demo"]
