# Container build for bayesian_cbf_tpu (reference parity: the reference
# ships a Dockerfile for its torch+GUROBI stack; this one targets a TPU
# host image).  For CPU-only CI, swap the jax extra to `jax[cpu]`.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/bayesian_cbf_tpu
COPY pyproject.toml README.md ./
COPY bayesian_cbf_tpu ./bayesian_cbf_tpu
COPY scripts ./scripts
COPY bench.py ./

RUN pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir optax matplotlib \
    && pip install --no-cache-dir -e .

# pre-build the native fastlog writer so first use is instant
RUN python -c "from bayesian_cbf_tpu.observability.fastlog import \
_load_or_build_lib; print('fastlog:', _load_or_build_lib() is not None)"

ENTRYPOINT ["python", "bench.py"]
