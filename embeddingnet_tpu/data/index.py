"""Dataset index: {class_name: [image_paths]} from disk layouts.

Re-implements ``ENDataLoader`` (``embedding_net/datagenerators.py:16-111``)
with the same public surface: CSV annotation files (configurable
id/label columns, optional google 3-level path layout) or folder-per-class
directories (with one level of optional subdirs), per-class train/val split
with the reference's fixed ``random_state=42``, and an on-disk parse cache.

Fixed vs the reference (documented, not reproduced):

* the reference caches every CSV parse to the same ``tmp/data.pickle``
  (``datagenerators.py:63-71``), so loading the val CSV after the train CSV
  silently returns the *train* index; the cache here is keyed by the CSV
  path + mtime.
* ``.jpg``/``.png`` filtering kept, including dot-underscore exclusion;
  the reference's operator-precedence quirk (``a or b and c``,
  ``datagenerators.py:100-102``) is resolved to the evident intent.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Dict, List, Optional

from sklearn.model_selection import train_test_split

ClassFiles = Dict[str, List[str]]

_IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def _is_image(name: str) -> bool:
    return name.lower().endswith(_IMG_EXTS) and not name.startswith("._")


class ENDataLoader:
    """Disk index with ``.train_data``, ``.val_data``, ``.class_names``,
    ``.n_classes``, ``.n_samples`` — the attribute surface consumed by the
    reference call sites (``tools/train.py:94,110-117``)."""

    def __init__(self, dataset_path: str,
                 train_csv_file: Optional[str] = None,
                 val_csv_file: Optional[str] = None,
                 image_id_column: str = "image_id",
                 label_column: str = "label",
                 validate: bool = True,
                 val_ratio: float = 0.1,
                 is_google: bool = False,
                 cache_index: bool = True,
                 cache_dir: str = "tmp"):
        self.dataset_path = dataset_path
        self.cache_index = cache_index
        self.cache_dir = cache_dir

        if train_csv_file is not None:
            self.class_files_paths = self._load_from_dataframe(
                train_csv_file, image_id_column, label_column, is_google)
        else:
            self.class_files_paths = self._load_from_directory()
        self.class_names = list(self.class_files_paths.keys())

        self.n_classes = len(self.class_names)
        self.n_samples = {k: len(v) for k, v in self.class_files_paths.items()}

        self.validate = validate
        self.val_ratio = val_ratio

        if self.validate:
            if val_csv_file is not None:
                self.train_data = self.class_files_paths
                self.val_data = self._load_from_dataframe(
                    val_csv_file, image_id_column, label_column, is_google)
            else:
                self.train_data, self.val_data = self.split_train_val(
                    self.val_ratio)
        else:
            self.train_data = self.class_files_paths
            self.val_data: ClassFiles = {}

    # -- splits ------------------------------------------------------------

    def split_train_val(self, val_ratio: float):
        """Per-class split, ``random_state=42`` like the reference
        (``datagenerators.py:51-58``). Classes too small to split keep all
        samples in train (the reference would raise)."""
        train_data: ClassFiles = {}
        val_data: ClassFiles = {}
        for k, v in self.class_files_paths.items():
            if len(v) < 2:
                train_data[k] = v
                val_data[k] = []
                continue
            train_d, val_d = train_test_split(v, test_size=val_ratio,
                                              random_state=42)
            train_data[k] = train_d
            val_data[k] = val_d
        return train_data, val_data

    # -- CSV layout --------------------------------------------------------

    def _cache_path(self, csv_file: str, image_id_column: str,
                    label_column: str, is_google: bool) -> str:
        stamp = str(os.path.getmtime(csv_file)) if os.path.exists(csv_file) \
            else "missing"
        # Key over EVERYTHING that shapes the parsed index, not just the
        # file — re-reading the same CSV with different column mapping,
        # layout flag, or dataset root must not hit a stale entry.
        key = hashlib.sha1(
            f"{os.path.abspath(csv_file)}:{stamp}:{image_id_column}:"
            f"{label_column}:{is_google}:{os.path.abspath(self.dataset_path)}"
            .encode()).hexdigest()[:16]
        return os.path.join(self.cache_dir, f"index_{key}.pickle")

    def _load_from_dataframe(self, csv_file: str, image_id_column: str,
                             label_column: str, is_google: bool) -> ClassFiles:
        """CSV -> index (``datagenerators.py:60-87``), cache keyed per file."""
        cache_file = None
        if self.cache_index:
            os.makedirs(self.cache_dir, exist_ok=True)
            cache_file = self._cache_path(csv_file, image_id_column,
                                          label_column, is_google)
            if os.path.isfile(cache_file):
                with open(cache_file, "rb") as f:
                    return pickle.load(f)

        import pandas as pd
        dataframe = pd.read_csv(csv_file)
        if image_id_column not in dataframe.columns:
            raise ValueError(
                f"column {image_id_column!r} not in {csv_file} "
                f"(has: {list(dataframe.columns)})")
        if label_column not in dataframe.columns:
            raise ValueError(
                f"column {label_column!r} not in {csv_file} "
                f"(has: {list(dataframe.columns)})")

        class_files_paths: ClassFiles = {}
        for class_name in dataframe[label_column].unique():
            image_names = dataframe.loc[
                dataframe[label_column] == class_name][image_id_column]
            if is_google:
                # google-landmarks layout: <root>/a/b/c/abcdef....jpg
                image_paths = [
                    os.path.join(self.dataset_path, f"{f[0]}/{f[1]}/{f[2]}/",
                                 f + ".jpg")
                    for f in image_names]
            else:
                image_paths = [os.path.join(self.dataset_path, f)
                               for f in image_names]
            class_files_paths[str(class_name)] = image_paths

        if cache_file:
            with open(cache_file, "wb") as f:
                pickle.dump(class_files_paths, f)
        return class_files_paths

    # -- folder layout -----------------------------------------------------

    def _load_from_directory(self) -> ClassFiles:
        """Folder-per-class, optional one-level subdirs
        (``datagenerators.py:89-111``)."""
        class_files_paths: ClassFiles = {}
        entries = sorted((f for f in os.scandir(self.dataset_path)
                          if f.is_dir()), key=lambda f: f.name)
        for entry in entries:
            subdirs = [f.path for f in os.scandir(entry.path) if f.is_dir()]
            files: List[str] = []
            scan_dirs = subdirs if subdirs else [entry.path]
            for d in scan_dirs:
                files.extend(sorted(
                    f.path for f in os.scandir(d)
                    if f.is_file() and _is_image(f.name)))
            class_files_paths[entry.name] = files
        return class_files_paths

    # -- flat views (fixes models.py:150-152 images_paths latent bug) ------

    def flat(self, split: str = "train"):
        """(paths, labels) lists for a split — the surface
        ``calculate_prediction_accuracy`` needed but the reference never
        defined (``embedding_net/models.py:150-152``)."""
        data = self.train_data if split == "train" else self.val_data
        paths, labels = [], []
        for cls, ps in data.items():
            paths.extend(ps)
            labels.extend([cls] * len(ps))
        return paths, labels
