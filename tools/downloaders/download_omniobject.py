"""OmniObject3D fetch via OpenXLab CLI (reference
src/data/downloaders/download_omniobject.py:1-19)."""

from __future__ import annotations

import argparse
import subprocess


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--output-dir", required=True)
    p.add_argument(
        "--source-path",
        default="/raw/raw_scans",
        help="repository sub-path to fetch",
    )
    args = p.parse_args(argv)
    subprocess.run(
        [
            "openxlab", "dataset", "download",
            "--dataset-repo", "OpenXDLab/OmniObject3D-New",
            "--source-path", args.source_path,
            "--target-path", args.output_dir,
        ],
        check=True,
    )


if __name__ == "__main__":
    main()
