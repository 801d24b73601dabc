"""Index-builder CLI — parity with the reference's console script
``seqvec_search_create_index`` (reference: seqvec_search/create_index.py:18-47,
pyproject.toml:28-30): builds an LSH index over a dataset's train.npy and
persists it.
"""

import argparse
import logging
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from ..utils.logging import configure_logging
from .io import write_index
from .lsh import LSHIndex

logger = logging.getLogger(__name__)


def create_index_main(args: Optional[Sequence[str]] = None) -> None:
    configure_logging()
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--dir",
        type=Path,
        default=Path(),
        help="The name of the directory containing the database",
    )
    parser.add_argument(
        "--index", type=Path, required=True, help="The location to write the index to"
    )
    parser.add_argument(
        "--param",
        type=int,
        default=1024,
        help="The tuning parameter of the index (LSH bits). Higher means higher precision",
    )
    opts = parser.parse_args(args)

    train = opts.dir / "train.npy"
    logger.info("Loading database from %s", train)
    embeddings = np.load(train)
    logger.info(
        "Building %d-bit LSH index on %s", opts.param, embeddings.shape
    )
    index = LSHIndex(embeddings.shape[1], nbits=opts.param).add(embeddings)
    logger.info("Writing the LSH index to %s", opts.index)
    write_index(index, opts.index)


if __name__ == "__main__":
    create_index_main()
