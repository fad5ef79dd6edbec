"""Interpretability plots of the learned graph structure.

Parity targets: /root/reference/plot.py (cv2 + matplotlib renderers of
boxes and adjacency-weighted edges, predictions CSV) and plot_mpl.py
(gradient-line helpers, adjacency npz inspector, question lookup).

The renderer draws the top-N nodes by adjacency mass with linewidth and
alpha proportional to node weight, and pairwise edges between their box
centres with linewidth/alpha proportional to A[i,j]/max — the same visual
encoding as plot.py:531-591. Raw COCO/medical images are optional: when
no image is supplied the boxes are drawn on a blank canvas (the learned
structure is the object of interest).
"""

from __future__ import annotations

import csv
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import matplotlib

matplotlib.use("Agg")
import matplotlib.collections as mcoll  # noqa: E402
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def make_segments(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Line -> segment array for LineCollection (plot_mpl.py helper)."""
    points = np.array([x, y]).T.reshape(-1, 1, 2)
    return np.concatenate([points[:-1], points[1:]], axis=1)


def colorline(ax, x, y, z=None, cmap="copper", linewidth=3, alpha=1.0):
    """Gradient-coloured line (plot_mpl.py colorline equivalent)."""
    x, y = np.asarray(x), np.asarray(y)
    if z is None:
        z = np.linspace(0.0, 1.0, len(x))
    z = np.asarray(z, dtype=float)
    segs = make_segments(x, y)
    lc = mcoll.LineCollection(segs, array=z, cmap=plt.get_cmap(cmap),
                              linewidth=linewidth, alpha=alpha)
    ax.add_collection(lc)
    return lc


def node_weights_from_adjacency(adjacency: np.ndarray) -> np.ndarray:
    """Per-node importance = row-sum of the learned adjacency
    (plot.py sort_boxes: nodes ranked by adjacency mass)."""
    return np.asarray(adjacency).sum(axis=-1)


def plot_adjacency_graph(
    boxes: np.ndarray,
    adjacency: np.ndarray,
    *,
    image: Optional[np.ndarray] = None,
    image_size: Tuple[int, int] = (640, 480),
    top_nodes: int = 7,
    question: str = "",
    prediction: str = "",
    answer: str = "",
    path: Optional[str] = None,
    cmap: str = "viridis",
):
    """Render top-N boxes + pairwise adjacency edges.

    Args:
      boxes: (K, 4) normalized xyxy boxes.
      adjacency: (K, K) learned adjacency for this sample.
      image: optional HxWx3 uint8 background.
      image_size: (W, H) canvas when image is None.
    Returns the matplotlib figure (saved+closed if path given).
    """
    boxes = np.asarray(boxes, dtype=np.float64)
    adjacency = np.asarray(adjacency, dtype=np.float64)
    k = boxes.shape[0]
    w, h = image_size if image is None else (image.shape[1], image.shape[0])

    fig, ax = plt.subplots(figsize=(8, 6))
    if image is not None:
        ax.imshow(image)
    else:
        ax.set_xlim(0, w)
        ax.set_ylim(h, 0)  # image coordinates
        ax.set_facecolor("#202020")

    weights = node_weights_from_adjacency(adjacency)
    order = np.argsort(weights)[::-1][: min(top_nodes, k)]
    wmax = max(weights[order].max(), 1e-12)
    amax = max(np.abs(adjacency).max(), 1e-12)
    colors = plt.get_cmap(cmap)(np.linspace(0.2, 0.95, len(order)))

    px = boxes.copy()
    px[:, [0, 2]] *= w
    px[:, [1, 3]] *= h
    centres = np.stack([(px[:, 0] + px[:, 2]) / 2,
                        (px[:, 1] + px[:, 3]) / 2], axis=1)

    # boxes: linewidth/alpha proportional to node weight (plot.py:552-560)
    for rank, i in enumerate(order):
        rel = max(weights[i] / wmax, 0.0)
        rect = plt.Rectangle(
            (px[i, 0], px[i, 1]), px[i, 2] - px[i, 0], px[i, 3] - px[i, 1],
            fill=False, edgecolor=colors[rank],
            linewidth=0.5 + 2.5 * rel, alpha=0.35 + 0.65 * rel)
        ax.add_patch(rect)

    # pairwise edges between the selected nodes (plot.py:566-585)
    for a_i, i in enumerate(order):
        for j in order[a_i + 1:]:
            rel = abs(adjacency[i, j]) / amax
            if rel <= 1e-6:
                continue
            ax.plot([centres[i, 0], centres[j, 0]],
                    [centres[i, 1], centres[j, 1]],
                    color="orange", linewidth=0.5 + 3.0 * rel,
                    alpha=min(1.0, 0.15 + 0.85 * rel))

    caption = question
    if prediction or answer:
        caption += f"\npred: {prediction}   answer: {answer}"
    if caption:
        ax.set_title(caption, fontsize=10)
    ax.set_xticks([])
    ax.set_yticks([])
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return fig


def save_predictions_csv(rows: Sequence[Dict[str, str]], path: str):
    """image_id,question,prediction,answer CSV
    (plot.py:282-286 / run_imageclef.py:235-239 schema)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", newline="") as f:
        wr = csv.DictWriter(
            f, fieldnames=["image_id", "question", "prediction", "answer"])
        wr.writeheader()
        for r in rows:
            wr.writerow(r)


def read_adj(path: str) -> Dict[str, np.ndarray]:
    """Inspect a saved adjacency npz (plot_mpl.py read_adj)."""
    with np.load(path, allow_pickle=True) as z:
        return {k: z[k] for k in z.files}


def resolve_image_path(image_dir: Optional[str], image_id,
                       tasks: Sequence[str] = ("val2014", "train2014",
                                               "test2015")) -> Optional[str]:
    """Locate the raw image file for a dataset image_id.

    Mirrors the reference's lookup conventions: COCO ids resolve to
    COCO_{task}_{id:012d}.jpg (plot.py:448-453, 337), medical ids are
    already '<name>.jpg' keys (torch_dataset.py:269). Returns None when
    nothing matches (the caller then falls back to the blank canvas).
    """
    if not image_dir:
        return None
    sid = str(image_id)
    candidates = [sid, sid + ".jpg", sid + ".png"]
    try:
        iid = int(image_id)
        candidates += [f"COCO_{t}_{iid:012d}.jpg" for t in tasks]
    except (TypeError, ValueError):
        pass
    for name in candidates:
        p = os.path.join(image_dir, name)
        if os.path.isfile(p):
            return p
    return None


def load_image(path: Optional[str]) -> Optional[np.ndarray]:
    """Read an image file to an RGB array (None-propagating)."""
    if path is None:
        return None
    return plt.imread(path)


def find_question(vqa_rows: List[dict], question: str,
                  image_id: Optional[str] = None) -> Optional[int]:
    """Row index of a (question, image_id) pair (plot_mpl find_question /
    plot.py get_iid_from_question)."""
    q = question.strip().lower().rstrip("?")
    for i, row in enumerate(vqa_rows):
        if row["question"].strip().lower().rstrip("?") == q:
            if image_id is None or str(row["image_id"]) == str(image_id):
                return i
    return None


def plot_given_question(model, params, ds, question: str,
                        image_id: Optional[str] = None,
                        path: Optional[str] = None, top_nodes: int = 7,
                        image_dir: Optional[str] = None):
    """Render the learned graph for one (question, image_id) pair — the
    plot_given_fig capability (plot.py:406-453): look the question up in
    the dataset, run a single forward pass, draw the figure. With
    image_dir the boxes/edges are drawn over the raw photograph (the
    paper-Fig-4 reproduction, plot.py:448-453)."""
    import jax
    import jax.numpy as jnp

    idx = find_question(ds.vqa, question, image_id)
    if idx is None:
        raise KeyError(f"question not found: {question!r}")
    t = ds.table
    q = jnp.asarray(t.tokens[idx:idx + 1])
    image = jnp.asarray(ds.store.batch(t.image_row[idx:idx + 1]))
    qlen = jnp.asarray(t.qlen[idx:idx + 1])
    logits, adjacency, _ = model.apply(params, q, image, qlen)
    # exclude the wordless answer-vocab pad slot (last column) before
    # the a_itow lookup, mirroring build_eval_step/serve.py
    pred = ds.a_itow[int(jax.numpy.argmax(logits[0][:-1]))]
    row = ds.vqa[idx]
    boxes = np.asarray(ds.store.boxes[t.image_row[idx]])
    raster = load_image(resolve_image_path(image_dir, row["image_id"]))
    return plot_adjacency_graph(
        boxes, np.asarray(adjacency[0]), top_nodes=top_nodes,
        image=raster,
        question=row["question"], prediction=pred,
        answer=row.get("answer", ""), path=path)


def visualize_checkpoint(model, params, ds, out_dir: str,
                         *, batch_size: int = 32, n_batches: int = 4,
                         top_nodes: int = 7, save_npz: bool = True,
                         num_devices: Optional[int] = None,
                         image_dir: Optional[str] = None) -> str:
    """Run inference, render per-sample adjacency figures and write the
    predictions CSV (the plot.py save_plot_nodes / plot_by_mpl driver).

    Evaluates only the n_batches it renders (max_batches) — the reference
    also stops after the batches it plots (plot.py:230 'if step == 100').
    The reported accuracy in summary.json is over those batches. With
    image_dir, figures are drawn over the raw photographs."""
    from vqa_project_tpu.train.loop import evaluate

    os.makedirs(out_dir, exist_ok=True)
    acc, result, adjacencies = evaluate(
        model, params, ds, batch_size, result_path=None,
        collect_adjacency=True, num_devices=num_devices,
        max_batches=n_batches)

    pred_by_qid = {r["question_id"]: r["answer"] for r in result}
    rows = []
    count = 0
    limit = min(n_batches * batch_size, ds.n_questions)
    indices = sorted(adjacencies)[:limit]
    for i in indices:
        row = ds.vqa[i]
        pred = pred_by_qid.get(int(row["question_id"]), "")
        rows.append({
            "image_id": row["image_id"],
            "question": row["question"],
            "prediction": pred,
            "answer": row.get("answer", ""),
        })
        img_row = ds.table.image_row[i]
        boxes = np.asarray(ds.store.boxes[img_row])
        raster = load_image(resolve_image_path(image_dir, row["image_id"]))
        plot_adjacency_graph(
            boxes, adjacencies[i], top_nodes=top_nodes, image=raster,
            question=row["question"], prediction=pred,
            answer=row.get("answer", ""),
            path=os.path.join(out_dir, f"adj_{row['question_id']}.jpg"))
        count += 1

    save_predictions_csv(rows, os.path.join(out_dir, "infer_predictions.csv"))
    if save_npz:
        np.savez_compressed(
            os.path.join(out_dir, "adjacencies.npz"),
            adjacency=np.stack([adjacencies[i] for i in indices]),
            index=np.asarray(indices))
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump({"accuracy": acc, "figures": count,
                   "eval_batches": n_batches}, f)
    return out_dir
