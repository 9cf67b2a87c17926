"""Generate the committed real-parser fixture: fixtures/judgment.docx.

A genuine ECMA-376 .docx (zip of WordprocessingML + Dublin-Core props +
embedded PNG media), built byte-deterministically by
plans/docx_parser.build_docx so re-running this script reproduces the
committed bytes exactly. The embedded images are real PNGs from the
stdlib PNG encoder (operators/imagecodec.encode_png).

Run from the repo root: python scripts/make_docx_fixture.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from da_transform_judgments_pipeline_spark.operators.imagecodec import (  # noqa: E402
    encode_png,
)
from da_transform_judgments_pipeline_spark.plans.docx_parser import (  # noqa: E402
    build_docx,
)

PARAGRAPHS = [
    "Example v Sample",
    "[2023] EWHC 123 (Admin)",
    "Before: The Honourable Judge Example",
    "1. This is the first paragraph of the approved judgment, handed "
    "down in the Administrative Court.",
    "2. The second paragraph refers to the map reproduced below and to "
    "the schedule annexed to this judgment.",
    "3. For the reasons given above, the application is dismissed.",
]


def main() -> None:
    grad = np.zeros((8, 8, 3), dtype=np.uint8)
    grad[:, :, 0] = np.arange(8, dtype=np.uint8)[None, :] * 32
    grad[:, :, 1] = np.arange(8, dtype=np.uint8)[:, None] * 32
    grad[:, :, 2] = 128
    checker = np.zeros((6, 6, 3), dtype=np.uint8)
    checker[::2, ::2] = 255
    checker[1::2, 1::2] = 255
    blob = build_docx(
        PARAGRAPHS,
        title="Example v Sample",
        creator="Administrative Court",
        created="2023-01-15T10:30:00Z",
        images={
            "image1.png": encode_png(grad),
            "image2.png": encode_png(checker),
        },
    )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
        "judgment.docx",
    )
    with open(out, "wb") as f:
        f.write(blob)
    print(f"wrote {out} ({len(blob)} bytes)")


if __name__ == "__main__":
    main()
