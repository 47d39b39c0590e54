FROM python:3.12-slim
RUN apt-get update && apt-get install -y --no-install-recommends g++ zlib1g-dev && \
    rm -rf /var/lib/apt/lists/*
WORKDIR /app
COPY . .
RUN pip install --no-cache-dir numpy "jax[cpu]" && \
    python -c "from vcf2prot_tpu.native_bridge import load_native; assert load_native()"
ENTRYPOINT ["python", "-m", "vcf2prot_tpu"]
