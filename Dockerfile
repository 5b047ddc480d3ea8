# Serving image for the TPU two-tower retrieval engine.
#
# Counterpart of the reference Dockerfile (ref: Dockerfile:1-30), with its
# quirks fixed: no artifact run is baked into the image (the reference
# copies one specific artifacts/run-* and a prebuilt chroma_store,
# Dockerfile:21-24) — artifacts mount at runtime, and there is no separate
# ANN store to build at all (the index is the embedding matrix itself).
#
# CPU serving works out of the box (the retrieval kernels fall back to the
# exact segmented XLA path); on a TPU VM base the same image uses the
# Pallas kernel.

FROM python:3.12-slim

WORKDIR /app

COPY pyproject.toml README.md ./
COPY twotowermlretrieval_tpu ./twotowermlretrieval_tpu
COPY frontend ./frontend
COPY tools ./tools

# jax[cpu] pins the CPU jaxlib; the package's own deps come from pyproject
RUN pip install --no-cache-dir "jax[cpu]" && pip install --no-cache-dir .

EXPOSE 8888

# artifacts are mounted at /artifacts (docker-compose.yml does this)
CMD ["ttr-serve", "--artifacts", "/artifacts", "--port", "8888", "--host", "0.0.0.0"]
