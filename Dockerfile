# TPU-native Sentiric STT service.
#
# Counterpart of the reference's two-stage CUDA/CPU builds
# (/root/reference/Dockerfile, Dockerfile.gpu + the latest/latest-gpu CI
# matrix, build-and-push.yml:17-27): ONE Dockerfile, two variants by
# build-arg — `latest` ships the TPU wheel (libtpu via jax[tpu]),
# `latest-cpu` ships plain CPU jax for dev/edge hosts. The CI matrix
# builds both.

FROM python:3.12-slim AS base

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential curl ffmpeg protobuf-compiler \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app

# JAX_TARGET="jax[tpu]" (default) pulls libtpu for TPU VMs — harmless on
# CPU-only hosts (jax falls back); JAX_TARGET="jax" builds the smaller
# CPU-only image.
ARG JAX_TARGET="jax[tpu]"
RUN pip install --no-cache-dir \
        "${JAX_TARGET}" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        aiohttp grpcio prometheus-client tiktoken regex safetensors scipy optax

COPY pyproject.toml ./
COPY sentiric_stt_whisper_service_tpu ./sentiric_stt_whisper_service_tpu
COPY native ./native
COPY studio ./studio

# Build the native audio runtime and regenerate protobuf code.
RUN make -C native && \
    protoc --python_out=sentiric_stt_whisper_service_tpu/serving/proto \
        -I sentiric_stt_whisper_service_tpu/serving/proto \
        sentiric_stt_whisper_service_tpu/serving/proto/stt.proto && \
    pip install --no-cache-dir --no-build-isolation -e .

# Non-root runtime user (reference Dockerfile:51,73).
RUN useradd -m -u 1000 appuser && \
    mkdir -p /models && chown -R appuser /models /app
USER appuser

# HTTP / gRPC / metrics (reference config.h:12-14).
EXPOSE 15030 15031 15032
VOLUME /models

ENTRYPOINT ["python", "-m", "sentiric_stt_whisper_service_tpu.serving"]
