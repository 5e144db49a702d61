"""Shared fixtures: reference golden micro-frames
(semantics from /root/reference/hooqu/tests/fixtures.py:9-110) and a
session-scoped Ray session for the distributed-path tests."""

import pandas as pd
import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            log_to_driver=False,
        )
    yield ray
    ray.shutdown()


@pytest.fixture
def df_missing():
    rows = [
        (1, "a", "f"), (2, "b", "d"), (3, None, "f"), (4, "a", None),
        (5, "a", "f"), (6, None, "d"), (7, None, "d"), (8, "b", None),
        (9, "a", "f"), (10, None, None), (11, None, "f"), (12, None, "d"),
    ]
    return pd.DataFrame(rows, columns=["item", "att1", "att2"])


@pytest.fixture
def df_full():
    rows = [(1, "a", "c"), (2, "a", "c"), (3, "a", "c"), (4, "b", "d")]
    return pd.DataFrame(rows, columns=["item", "att1", "att2"])


@pytest.fixture
def df_with_numeric_values():
    rows = [
        (1, 1, 0, 0), (2, 2, 0, 0), (3, 3, 0, 0),
        (4, 4, 5, 4), (5, 5, 6, 6), (6, 6, 7, 7),
    ]
    return pd.DataFrame(rows, columns=("item", "att1", "att2", "att3"))


@pytest.fixture
def df_comp_incomp():
    rows = [
        (1, "a", "f"), (2, "b", "d"), (3, "a", None),
        (4, "a", "f"), (5, "b", None), (6, "a", "f"),
    ]
    return pd.DataFrame(rows, columns=("item", "att1", "att2"))


@pytest.fixture
def df_with_unique_columns():
    rows = [
        (1, 0, 3, 1, 5, 0),
        (2, 0, 3, 2, 6, 0),
        (3, 0, 3, None, 7, 0),
        (4, 5, None, 3, 0, 4),
        (5, 6, None, 4, 0, 5),
        (6, 7, None, 5, 0, 6),
    ]
    return pd.DataFrame(
        rows,
        columns=(
            "unique",
            "nonUnique",
            "nonUniqueWithNulls",
            "uniqueWithNulls",
            "onlyUniqueWithOtherNonUnique",
            "halfUniqueCombinedWithNonUnique",
        ),
    )


@pytest.fixture
def df_with_distinct_values():
    rows = [("a", None), ("a", None), (None, "x"), ("b", "x"), ("b", "x"), ("c", "y")]
    return pd.DataFrame(rows, columns=("att1", "att2"))


@pytest.fixture
def sample_product_data():
    rows = [
        (1, "Thingy A", "awesome thing.", "high", 0),
        (2, "Thingy B", "available at http://thingb.com", None, 0),
        (3, None, None, "low", 5),
        (4, "Thingy D", "checkout https://thingd.ca", "low", 10),
        (5, "Thingy E", None, "high", 12),
    ]
    return pd.DataFrame(
        rows, columns=["id", "productName", "description", "priority", "numViews"]
    )
