"""Shared prediction-overlay rendering (VideoVisualizer parity).

Re-implements the reference `slowfast/visualization/video_visualizer.py`
surface on PIL: a deterministic per-class color palette (the reference
samples a matplotlib colormap by class id), top-k text with score-scaled
alpha backgrounds, score bars, a lower-third text block for clip-level
predictions, and labeled boxes for detection overlays.
"""

import colorsys

import numpy as np


def class_color(class_id, num_classes=400):
    """Deterministic palette: hue spread over classes (the reference
    samples `cm.get_cmap('rainbow')(i / num_classes)`)."""
    h = (class_id % max(num_classes, 1)) / max(num_classes, 1)
    r, g, b = colorsys.hsv_to_rgb(h, 0.85, 1.0)
    return int(r * 255), int(g * 255), int(b * 255)


def _text_w(text):
    return 6 * len(text) + 4


def draw_predictions(frame, preds, class_names, top_k=3, thres=0.0,
                     num_classes=None):
    """Lower-third top-k overlay with class colors and score bars.

    frame: uint8 [H, W, 3]; preds: [C] scores (post-softmax or sigmoid).
    Returns a new annotated uint8 array.
    """
    from PIL import Image, ImageDraw

    preds = np.asarray(preds, np.float32)
    num_classes = num_classes or len(preds)
    order = np.argsort(preds)[::-1][:top_k]
    order = [i for i in order if preds[i] >= thres] or [int(order[0])]

    img = Image.fromarray(frame)
    draw = ImageDraw.Draw(img, "RGBA")
    h, w = frame.shape[:2]
    line_h = 16
    y0 = h - line_h * len(order) - 6
    draw.rectangle([0, y0 - 2, w, h], fill=(0, 0, 0, 150))
    for row, i in enumerate(order):
        y = y0 + row * line_h
        color = class_color(int(i), num_classes)
        name = class_names[i] if i < len(class_names) else str(int(i))
        score = float(preds[i])
        # Score bar behind the text (reference: score-scaled alpha).
        bar_w = int((w - 8) * max(min(score, 1.0), 0.0))
        draw.rectangle([4, y + 2, 4 + bar_w, y + line_h - 3],
                       fill=color + (70,))
        draw.rectangle([4, y + 3, 12, y + line_h - 4], fill=color + (255,))
        draw.text((16, y), f"{name}: {score:.3f}", fill=(255, 255, 255, 255))
    return np.asarray(img.convert("RGB"))


def draw_boxes(frame, boxes, labels_per_box, num_classes=80):
    """Detection overlay: colored boxes + per-box label stacks.

    boxes: [N, 4] pixel xyxy; labels_per_box: list of [(class_id, name,
    score), ...] per box. Returns a new annotated uint8 array."""
    from PIL import Image, ImageDraw

    img = Image.fromarray(frame)
    draw = ImageDraw.Draw(img, "RGBA")
    for box, labels in zip(boxes, labels_per_box):
        x1, y1, x2, y2 = [float(v) for v in box]
        box_color = (0, 255, 0)
        if labels:
            box_color = class_color(int(labels[0][0]), num_classes)
        draw.rectangle([x1, y1, x2, y2], outline=box_color + (255,), width=2)
        y = y1 + 2
        for cid, name, score in labels:
            text = f"{name}: {score:.2f}"
            c = class_color(int(cid), num_classes)
            draw.rectangle(
                [x1 + 2, y - 1, x1 + 2 + _text_w(text), y + 12],
                fill=c + (160,),
            )
            draw.text((x1 + 4, y), text, fill=(255, 255, 255, 255))
            y += 14
    return np.asarray(img.convert("RGB"))
