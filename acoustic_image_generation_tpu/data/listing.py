"""Dataset-preparation glue: frame counting and CSV -> list conversion.

Ports the reference's small capture-massaging scripts:
- ``framecount.py``: count captured frames per directory and write the
  ``video_time.txt`` the converter reads (full seconds only).
- ``readcsv.py`` / ``readave.py`` / ``csvtxt.py``: parse the AVE /
  VGGSound-style annotation CSVs into per-class download/clip lists.
"""

from __future__ import annotations

import csv
import glob
import os

FRAMES_PER_SECOND = 12


def write_video_time(capture_dir: str, pattern: str = "video/I_*.bmp") -> int:
    """Count frames and write ``video_time.txt`` (whole seconds).

    Returns the number of seconds recorded.
    """
    n_frames = len(glob.glob(os.path.join(capture_dir, pattern)))
    seconds = n_frames // FRAMES_PER_SECOND
    with open(os.path.join(capture_dir, "video_time.txt"), "w") as f:
        f.write(f"time: {seconds}\n")
    return seconds


def csv_to_clip_lists(
    csv_path: str,
    out_dir: str,
    *,
    id_col: int = 0,
    start_col: int = 1,
    label_col: int = 2,
    header: bool = True,
) -> dict[str, str]:
    """Annotation CSV (VGGSound/AVE style rows: youtube_id, start, label,
    ...) -> one txt per label listing ``id,start`` clips. Returns
    {label: path}."""
    by_label: dict[str, list[str]] = {}
    with open(csv_path, newline="") as f:
        reader = csv.reader(f)
        for i, row in enumerate(reader):
            if header and i == 0:
                continue
            if len(row) <= max(id_col, start_col, label_col):
                continue
            label = row[label_col].strip().replace(" ", "_")
            by_label.setdefault(label, []).append(
                f"{row[id_col].strip()},{row[start_col].strip()}"
            )
    os.makedirs(out_dir, exist_ok=True)
    out = {}
    for label, clips in sorted(by_label.items()):
        path = os.path.join(out_dir, f"{label}.txt")
        with open(path, "w") as f:
            f.write("\n".join(clips) + "\n")
        out[label] = path
    return out
