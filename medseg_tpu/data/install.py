"""Dataset installer (behavioral twin of utils/install_dataset.py).

Downloads the Kaggle COVID-19 Radiography Database via kagglehub, moves it
into `dataset/`, renames Viral Pneumonia -> Non-COVID and Normal -> Healthy,
and removes the Lung_Opacity class and metadata files
(install_dataset.py:11-55).  Gated: raises a clear error when kagglehub or
network access is unavailable (this build environment has neither).
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

MAIN_DATA_FOLDER = "COVID-19_Radiography_Dataset"
FILES_TO_REMOVE = (
    "COVID.metadata.xlsx",
    "README.md.txt",
    "Lung_Opacity.metadata.xlsx",
    "Normal.metadata.xlsx",
    "Viral Pneumonia.metadata.xlsx",
)
FOLDER_TO_REMOVE = "Lung_Opacity"
RENAMES = (("Viral Pneumonia", "Non-COVID"), ("Normal", "Healthy"))


def organize_downloaded_tree(src: Path, dest: Path) -> None:
    """Pure-filesystem half of the install: move the downloaded tree into
    `dest`, apply the class renames, drop the Lung_Opacity class and the
    metadata files (install_dataset.py:32-54 semantics).  Split from the
    kagglehub download so it is testable offline."""
    for item in Path(src).iterdir():
        shutil.move(str(item), str(dest / item.name))
    for old, new in RENAMES:
        os.rename(dest / old, dest / new)
    shutil.rmtree(dest / FOLDER_TO_REMOVE, ignore_errors=True)
    for f in FILES_TO_REMOVE:
        try:
            os.remove(dest / f)
        except FileNotFoundError:
            pass
    shutil.rmtree(src, ignore_errors=True)


def install_dataset(dest_root: str = "dataset") -> None:
    dest = Path(dest_root).absolute()
    if dest.is_dir() and any(dest.iterdir()):
        print(f"Local dataset folder already exists and is not empty at: {dest}")
        return
    try:
        import kagglehub
    except ImportError as e:
        raise RuntimeError(
            "kagglehub is not installed; install it (and ensure network "
            "access) to download tawsifurrahman/covid19-radiography-database, "
            "or place the dataset under "
            f"{dest}/<class>/{{images,masks}}/*.png manually.") from e

    dest.mkdir(parents=True, exist_ok=True)
    cache = kagglehub.dataset_download(
        "tawsifurrahman/covid19-radiography-database")
    organize_downloaded_tree(Path(cache) / MAIN_DATA_FOLDER, dest)
    print("DONE!")
