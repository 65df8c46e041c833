from __future__ import annotations

import pytest

from shacl_dqa_prototype_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("shacl-dqa-tests", cores=4, shuffle_partitions=8)
    yield s
