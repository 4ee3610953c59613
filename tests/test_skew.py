from __future__ import annotations

import pandas as pd

import ray.data as rd

from scheduler_ray.stages import skew


def _skewed():
    rows = [{"k": "hot", "v": i} for i in range(900)] + [
        {"k": f"cold{i % 10}", "v": i} for i in range(100)
    ]
    return rd.from_pandas(pd.DataFrame(rows))


def test_detect_hot_keys():
    assert skew.detect_hot_keys(_skewed(), "k", hot_fraction=0.5) == ["hot"]


def test_salting_flattens_groups():
    ds = _skewed()
    sizes = skew.salted_group_sizes(ds, "k", hot_fraction=0.5, factor=8)
    hot_sizes = sizes[sizes["k"] == "hot"]["n"]
    assert len(hot_sizes) == 8  # hot key split into 8 sub-groups
    assert hot_sizes.max() < 900 / 8 * 2  # roughly flat
    cold = sizes[sizes["k"] != "hot"]
    assert (cold["salt"] == 0).all()  # cold keys unsalted


def test_salted_map_groups_counts():
    ds = _skewed()

    def count(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [g["k"].iloc[0]], "n": [len(g)]})

    out = skew.salted_map_groups(ds, "k", count, hot_keys=["hot"], factor=4).to_pandas()
    merged = out.groupby("k")["n"].sum()
    assert merged["hot"] == 900 and merged.drop("hot").sum() == 100
