"""PMV-400 data-list compatibility: parse the in-tree split CSVs
(`data_list/PMV/{split}_pmv400.csv`, byte-identical to the reference's
`MViT/data_list/PMV/*`, comma-separated `path,label` rows)
through the Kinetics dataset with the released recipe's config surface
(`run_uniformer_s16x4_PMV_release.sh:22` PATH_LABEL_SEPARATOR ",",
`DATA.PM_SUBSET _pmv400`)."""

import os

import pytest

from pmv_tpu.config import get_cfg
import pmv_tpu.data  # noqa: F401
from pmv_tpu.data.build import build_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PMV_LIST_DIR = os.path.join(REPO, "data_list", "PMV")


@pytest.mark.skipif(
    not os.path.isdir(PMV_LIST_DIR), reason="data lists absent"
)
@pytest.mark.parametrize(
    "mode,expected_rows",
    # Content rows (the released CSVs have no trailing newline, so wc -l
    # under-counts by one: 56451/19994 newlines = 56452/19995 rows).
    [("train", 56452), ("val", 19995), ("test", 19995)],
)
def test_pmv400_split_csvs_parse(mode, expected_rows):
    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = PMV_LIST_DIR
    cfg.DATA.PM_SUBSET = "_pmv400"
    cfg.DATA.PATH_LABEL_SEPARATOR = ","
    cfg.MODEL.NUM_CLASSES = 400
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 4
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    ds = build_dataset("kinetics", cfg, mode)
    views = 1 if mode in ("train", "val") else 4
    assert len(ds) == expected_rows * views
    # Labels span the 400-class taxonomy.
    labels = set(ds._labels)
    assert min(labels) >= 0 and max(labels) <= 399
    assert len(labels) > 300
    # Paths look like the released mp4 naming.
    assert ds._path_to_videos[0].endswith(".mp4")


@pytest.mark.skipif(
    not os.path.isdir(PMV_LIST_DIR), reason="data lists absent"
)
def test_class_name_mapping_parses():
    """Taxonomy CSV (`data/class_name_mapping.csv`): id <-> name rows for
    the 400 classes, consumable by the demo's label file loader."""
    path = os.path.join(REPO, "data", "class_name_mapping.csv")
    import csv

    with open(path, newline="") as f:
        rows = list(csv.reader(f))
    body = rows[1:] if not rows[0][-1].isdigit() else rows
    ids = sorted(int(r[-1]) for r in body if r)
    assert ids[0] in (0, 1)
    assert len(ids) >= 399
