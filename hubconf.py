"""torch.hub-style entry points (reference hubconf.py:14-66).

    import hubconf
    model = hubconf.yolov5m_obb(weights="runs/train/exp/best", names=[...])
    results = model(["image.png"])
"""

from yolov5_obb_tpu.api import load


def _create(size, **kw):
    return load(cfg=f"yolov5{size}.yaml", **kw)


def yolov5n_obb(**kw):
    return _create("n", **kw)


def yolov5s_obb(**kw):
    return _create("s", **kw)


def yolov5m_obb(**kw):
    return _create("m", **kw)


def yolov5l_obb(**kw):
    return _create("l", **kw)


def yolov5x_obb(**kw):
    return _create("x", **kw)


def custom(cfg, weights=None, **kw):
    return load(cfg=cfg, weights=weights, **kw)
