"""Shard-list expansion (SURVEY §2.1 S4; reference
``src/aces/expand_shards.py:9-76``).

In the reference this feeds Hydra multirun (one process per shard). The
Spark engine reads whole shard directories natively, so this survives only
as CLI sugar: expanding ``prefix/N`` specs or directories into explicit
shard lists for tooling that wants them.
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path


def expand_shards(*shards: str) -> str:
    """Expand ``prefix/N`` / ``prefix_N`` specs into ``prefix/0..N-1``, or a
    directory into the relative stems of every ``*.parquet`` beneath it.

    >>> expand_shards("train/4", "val/IID/1", "val/prospective/1")
    'train/0,train/1,train/2,train/3,val/IID/0,val/prospective/0'
    >>> expand_shards("data/data_4")
    'data/data_0,data/data_1,data/data_2,data/data_3'
    >>> expand_shards("train.invalid")
    Traceback (most recent call last):
        ...
    ValueError: Invalid shard format: train.invalid
    """
    result: list[str] = []
    for arg in shards:
        if os.path.isdir(arg):
            result.extend(
                str(x.relative_to(Path(arg)).with_suffix("")) for x in Path(arg).glob("**/*.parquet")
            )
        else:
            match = re.match(r"(.+)([/_])(\d+)$", arg)
            if not match:
                raise ValueError(f"Invalid shard format: {arg}")
            prefix, delimiter, num = match.group(1), match.group(2), int(match.group(3))
            result.extend(f"{prefix}{delimiter}{i}" for i in range(num))
    return ",".join(result)


def main() -> None:  # pragma: no cover
    print(expand_shards(*sys.argv[1:]))


if __name__ == "__main__":  # pragma: no cover
    main()
