# cellregmap-tpu container (reference parity: /root/reference/Dockerfile).
# For TPU runtime use a jax[tpu]-enabled base instead.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY cellregmap_tpu ./cellregmap_tpu
RUN pip install --no-cache-dir "jax[cpu]" scipy numpy tqdm && \
    pip install --no-cache-dir .

CMD ["python", "-c", "import cellregmap_tpu; print(cellregmap_tpu.__version__)"]
