# Reproducible TPU environment (reference Dockerfile adapted: CUDA base →
# TPU-enabled JAX; EGL retained for headless MuJoCo rendering,
# reference Dockerfile:35).
#
# Build:  docker build -t mjlab-tpu .
# Run:    docker run --privileged --network host mjlab-tpu       # on a TPU VM
#         docker run -e JAX_PLATFORMS=cpu mjlab-tpu              # CPU smoke

FROM python:3.12-slim-bookworm

ENV DEBIAN_FRONTEND=noninteractive
RUN apt-get update && apt-get install -y --no-install-recommends \
    git \
    curl \
    libegl-dev \
    libgl1 \
    libosmesa6 \
    && rm -rf /var/lib/apt/lists/*

ENV PIP_NO_CACHE_DIR=1
WORKDIR /app

# Dependency layer first for build caching.
COPY pyproject.toml /app/pyproject.toml
RUN pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install flax optax orbax-checkpoint chex einops numpy mujoco pytest

COPY . /app
RUN pip install --no-deps -e .

# Headless rendering for the offscreen renderer / video recording.
ENV MUJOCO_GL=egl
# Browser viewer port (viser).
EXPOSE 8080

CMD ["python", "-m", "pytest", "tests/test_env_smoke.py", "-q"]
