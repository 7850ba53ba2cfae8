# Container image for dense-visual-odometry-tpu
# (parity surface: the reference ships a py3.9-slim Dockerfile,
#  /root/reference/Dockerfile:1-11; this one targets TPU hosts).
#
# For TPU execution run on a TPU VM with the libtpu-enabled jax wheel;
# the same image tracks on CPU (slow) for CI / development.

FROM python:3.11-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential libpng-dev \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY dense_visual_odometry_tpu ./dense_visual_odometry_tpu
COPY native ./native
COPY configs ./configs
COPY bench.py ./

# CPU jax by default; on a TPU VM install instead:
#   pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir "jax[cpu]" numpy opencv-python-headless pyyaml \
    && pip install --no-cache-dir -e . \
    && make -C native

ENTRYPOINT ["python", "-m", "dense_visual_odometry_tpu.apps.benchmark"]
CMD ["--help"]
