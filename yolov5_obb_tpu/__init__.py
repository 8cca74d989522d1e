"""yolov5_obb_tpu — TPU-native oriented-bounding-box detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
hukaixuan19970627/yolov5_obb (YOLOv5 + CSL angle classification + rotated NMS +
DOTA toolchain), designed TPU-first:

* models:  Flax modules built from YAML graph specs (NHWC, bf16 compute)
* ops:     rotated-box geometry, exact rotated IoU, rotated NMS
           (XLA + Pallas kernels)
* data:    host-side DOTA pipeline (mosaic / perspective on polygons, CSL
           label generation, fixed-shape padding)
* engine:  dense target assignment + loss, optax training stack, pjit
           data-parallel training over a jax.sharding.Mesh
* devkit:  DOTA split / merge / evaluate toolchain (host NumPy)
"""

__version__ = "0.1.0"
