"""Fetch operator: frontier batch → (url, status, content bytes).

In the sandbox there is no network, so fetching is the deterministic
synthetic-web function (synth.page_bytes) applied per Arrow batch via
``mapInPandas`` — the exact stage shape a real HTTP fetcher would have
(async pool inside the UDF, one batch per partition slice), so swapping
in a real fetcher changes only the body of ``fetch_batches``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from bisque_spark.synth import World, page_bytes

FETCH_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("status", IntegerType()),
        StructField("content", BinaryType()),
    ]
)


def make_fetch_batches(
    world: World,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    def fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, statuses, contents = [], [], []
            for url in pdf["url"]:
                status, content = page_bytes(world, url)
                urls.append(url)
                statuses.append(status)
                contents.append(content)
            yield pd.DataFrame(
                {"url": urls, "status": statuses, "content": contents}
            )

    return fetch_batches


def fetch(df_urls: DataFrame, world: World) -> DataFrame:
    """Frontier slice (must contain ``url``) → fetched pages."""
    return df_urls.select("url").mapInPandas(
        make_fetch_batches(world), schema=FETCH_SCHEMA
    )
