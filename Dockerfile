# wsinsight-tpu container (mirrors the reference's Docker delivery,
# reference: Dockerfile + ci.yml:57-72; TPU runtime instead of CUDA).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make git \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/wsinsight-tpu
COPY pyproject.toml README.md ./
COPY wsinsight_tpu ./wsinsight_tpu
COPY scripts ./scripts

# TPU wheels: on a TPU VM replace with `pip install 'jax[tpu]' -f
# https://storage.googleapis.com/jax-releases/libtpu_releases.html`.
RUN pip install --no-cache-dir . && \
    make -C wsinsight_tpu/native

ENTRYPOINT ["wsinsight"]
CMD ["--help"]
