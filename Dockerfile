# yolov5_obb_tpu — TPU-VM image (reference: Dockerfile, which targets CUDA;
# this one targets Cloud TPU VMs / the libtpu PJRT plugin).
#
#   docker build -t yolov5_obb_tpu .
#   docker run --privileged --network host -v /data:/data yolov5_obb_tpu \
#       python train.py --cfg yolov5m.yaml --data /data/dota_run.yaml \
#       --imgsz 1024 --batch-size 64 --epochs 300
#
# --privileged + host network are the standard Cloud-TPU container flags
# (the TPU driver is exposed via /dev/accel*).

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ libgl1 libglib2.0-0 && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt && \
    pip install --no-cache-dir "jax[tpu]" \
      -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY . .

# native helper builds lazily on first use (yolov5_obb_tpu/native); warm it
# here so containers start ready
RUN python -c "from yolov5_obb_tpu.native import get_lib; get_lib()" || true

ENV PYTHONUNBUFFERED=1
CMD ["python", "-c", "import jax; print(jax.devices())"]
