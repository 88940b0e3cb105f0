"""EAST-style detection decode: score/geo maps -> quads.

Re-expression of the reference's C kernel
(davarocr/davar_det/core/post_processing/lib/east_postprocess.cpp:530-665,
python wrapper post_east.py:22-192) as vectorized numpy inside a Spark
Arrow batch stage — the same one-call-per-batch contract the reference
gets from ctypes.

Exact semantics preserved:
- candidate generation in pixel row-major order, score > thres_text
  (strictly greater), quad restore:
  - QUAD mode: 8 geo channels are corner offsets added to
    (pool_ratio*w, pool_ratio*h) (cpp:594-606);
  - RBOX mode: distances (up, right, down, left) + angle rotated about
    the pixel center (cpp:610-627);
- locality-aware NMS: single sequential pass in candidate order,
  weighted-merge consecutive candidates while IoU > nms_thres; merged
  confidence is the SUM of member scores (cpp:366-388 EAST_OUT_merge —
  quirk preserved, confidences may exceed 1);
- standard NMS: stable sort by confidence desc, suppress IoU >
  nms_thres (cpp:462-510);
- rescale by 1/scale_factor on output.
"""

from __future__ import annotations

import numpy as np

from ..functions.geometry import poly_iou


def _restore_quads(score_map, geo_map, h, w, mode, pool_ratio, thres_text):
    """Vectorized candidate quad restore. Returns [N, 8] quads and [N]
    scores in pixel row-major candidate order."""
    score = np.asarray(score_map, dtype=np.float64).reshape(h, w)
    ys, xs = np.nonzero(score > thres_text)  # row-major order
    scores = score[ys, xs]
    n = len(xs)
    quads = np.empty((n, 8), dtype=np.float64)
    if n == 0:
        return quads, scores
    px = pool_ratio * xs.astype(np.float64)
    py = pool_ratio * ys.astype(np.float64)
    geo = np.asarray(geo_map, dtype=np.float64)
    if mode == "QUAD":
        g = geo.reshape(8, h, w)[:, ys, xs]
        quads[:, 0::2] = (px[None, :] + g[0::2]).T
        quads[:, 1::2] = (py[None, :] + g[1::2]).T
    else:  # RBOX
        g = geo.reshape(5, h, w)[:, ys, xs]
        up, right, down, left, ang = g
        sin, cos = np.sin(ang), np.cos(ang)
        quads[:, 0] = px - up * sin - left * cos
        quads[:, 1] = py - up * cos + left * sin
        quads[:, 2] = px - up * sin + right * cos
        quads[:, 3] = py - up * cos - right * sin
        quads[:, 4] = px + down * sin + right * cos
        quads[:, 5] = py + down * cos - right * sin
        quads[:, 6] = px + down * sin - left * cos
        quads[:, 7] = py + down * cos + left * sin
    return quads, scores


def _lanms(quads: np.ndarray, scores: np.ndarray, nms_thres: float):
    """Locality-aware NMS: one pass in candidate order, weighted-merge
    while consecutive IoU > thres; merged score accumulates."""
    out_q, out_s = [], []
    last_q, last_s = None, None
    for q, s in zip(quads, scores):
        if last_q is None:
            last_q, last_s = q.copy(), float(s)
            continue
        if poly_iou(q, last_q) > nms_thres:
            total = max(1e-8, s + last_s)
            last_q = (q * s + last_q * last_s) / total
            last_s = last_s + float(s)
        else:
            out_q.append(last_q)
            out_s.append(last_s)
            last_q, last_s = q.copy(), float(s)
    if last_q is not None:
        out_q.append(last_q)
        out_s.append(last_s)
    return out_q, out_s


def east_decode_py(
    score_map,
    geo_map,
    h: int,
    w: int,
    mode: str = "RBOX",
    scale_factor: float = 1.0,
    pool_ratio: int = 4,
    thres_text: float = 0.8,
    nms_thres: float = 0.2,
) -> list[tuple[list[float], float]]:
    """Full EAST decode for one document. Returns [(8-point quad,
    confidence)] ordered by confidence desc (the kernel's output
    order)."""
    quads, scores = _restore_quads(score_map, geo_map, h, w, mode, pool_ratio, thres_text)
    merged_q, merged_s = _lanms(quads, scores, nms_thres)
    n = len(merged_q)
    if n == 0:
        return []
    mq = np.asarray(merged_q)
    ms = np.asarray(merged_s)
    order = np.argsort(-ms, kind="stable")
    mq, ms = mq[order], ms[order]
    alive = np.ones(n, dtype=bool)
    for i in range(n):
        if not alive[i]:
            continue
        for j in range(i + 1, n):
            if alive[j] and poly_iou(mq[i], mq[j]) > nms_thres:
                alive[j] = False
    out = []
    for i in range(n):
        if alive[i]:
            out.append(((mq[i] / scale_factor).tolist(), float(ms[i])))
    return out


def east_decode_stage(df, thres_text: float = 0.8, nms_thres: float = 0.2, pool_ratio: int = 4):
    """mapInArrow stage over DET_MAPS rows (doc_id, score_map, geo_map,
    h, w, mode, scale_factor) -> (doc_id, quads array<struct<points,
    conf>>)."""
    import pyarrow as pa

    out_type = pa.list_(
        pa.struct([("points", pa.list_(pa.float64())), ("conf", pa.float64())])
    )

    def run(batches):
        for batch in batches:
            doc_ids = batch.column("doc_id")
            sm = batch.column("score_map").to_pylist()
            gm = batch.column("geo_map").to_pylist()
            hs = batch.column("h").to_pylist()
            ws = batch.column("w").to_pylist()
            modes = batch.column("mode").to_pylist()
            sfs = batch.column("scale_factor").to_pylist()
            quads_col = []
            for i in range(len(hs)):
                dets = east_decode_py(
                    sm[i], gm[i], hs[i], ws[i], modes[i], sfs[i],
                    pool_ratio, thres_text, nms_thres,
                )
                quads_col.append([{"points": q, "conf": c} for q, c in dets])
            yield pa.RecordBatch.from_arrays(
                [doc_ids, pa.array(quads_col, type=out_type)], names=["doc_id", "quads"]
            )

    from ..schemas import DET_QUADS

    return df.mapInArrow(run, schema=DET_QUADS)


# ---------------------------------------------------------------------------
# fixture generation: maps with known golden quads
# ---------------------------------------------------------------------------
def make_east_fixture(doc_idx: int, seed: int = 31, h: int = 24, w: int = 24, mode: str = "RBOX"):
    """Deterministic score/geo maps encoding axis-aligned rectangles
    (angle 0). Every inside-pixel predicts the same rectangle, so the
    decode must merge them into exactly the planted quads. Returns
    (row dict matching schemas.DET_MAPS, golden [(quad, n_pixels)])."""
    rng = np.random.default_rng(seed * 7919 + doc_idx)
    pool = 4
    score = np.zeros((h, w), dtype=np.float64)
    geo = np.zeros((8 if mode == "QUAD" else 5, h, w), dtype=np.float64)
    n_boxes = int(rng.integers(1, 4))
    golden = []
    for b in range(n_boxes):
        # rectangle in image coords, snapped away from others
        gy0 = 2 + b * (h // 3)
        gy1 = gy0 + int(rng.integers(2, h // 4))
        gx0 = int(rng.integers(2, 6))
        gx1 = gx0 + int(rng.integers(4, w - 10))
        x0, y0, x1, y1 = pool * gx0, pool * gy0, pool * gx1, pool * gy1
        n_pix = 0
        for gy in range(gy0, gy1 + 1):
            for gx in range(gx0, gx1 + 1):
                score[gy, gx] = 0.9
                px, py = pool * gx, pool * gy
                if mode == "QUAD":
                    geo[:, gy, gx] = [
                        x0 - px, y0 - py, x1 - px, y0 - py,
                        x1 - px, y1 - py, x0 - px, y1 - py,
                    ]
                else:
                    # up, right, down, left distances; angle 0
                    geo[:, gy, gx] = [py - y0, x1 - px, y1 - py, px - x0, 0.0]
                n_pix += 1
        golden.append(([x0, y0, x1, y0, x1, y1, x0, y1], n_pix))
    row = {
        "doc_id": f"det-{doc_idx}",
        "score_map": score.reshape(-1).tolist(),
        "geo_map": geo.reshape(-1).tolist(),
        "h": h,
        "w": w,
        "mode": mode,
        "scale_factor": 1.0,
    }
    return row, golden
