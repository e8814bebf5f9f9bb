# Container packaging (parity with the reference's Dockerfile/entrypoint.sh,
# /root/reference/Dockerfile:1-19). Runs the unified `smore` CLI; mount your
# edge lists under /data and pass paths relative to it.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/smore-tpu
COPY pyproject.toml README.md entrypoint.sh ./
COPY smore_tpu ./smore_tpu
RUN pip install --no-cache-dir . && chmod +x entrypoint.sh \
    && mkdir -p /opt/smore-tpu/data

# Mount edge lists at /opt/smore-tpu/data; entrypoint.sh rewrites path
# flags onto it (reference entrypoint.sh behavior).
ENTRYPOINT ["/opt/smore-tpu/entrypoint.sh"]
