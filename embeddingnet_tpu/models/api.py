"""High-level model API: EmbeddingNet / TripletNet / SiameseNet.

The reference's class surface (``embedding_net/models.py:22-236``) on a
functional JAX core: each class holds the Flax module + variables and
exposes the same methods — ``generate_encodings``, ``save_encodings``,
``load_encodings``, ``predict``, ``predict_knn``,
``calculate_prediction_accuracy``, ``train_embeddings_classifier``,
``save_base_model`` / ``load_model``.

Latent reference bugs fixed (documented):

* ``predict`` called a nonexistent ``calculate_distances``
  (``models.py:123``) — implemented here as nearest-neighbor over the
  encodings DB;
* ``calculate_prediction_accuracy`` iterated undefined
  ``data_loader.images_paths['val']`` (``models.py:150-152``) — uses the
  index's ``flat('val')`` view;
* ``generate_encodings`` fed raw 0..255 floats to the encoder while
  training fed ``/255.`` (``models.py:74`` vs ``datagenerators.py:156``) —
  here both paths normalize identically (``/255.`` on device).
"""

from __future__ import annotations

import json
import os
import pickle
import random
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from embeddingnet_tpu.data.images import get_image, get_images
from embeddingnet_tpu.models.registry import EmbeddingModule
from embeddingnet_tpu.ops import knn as knn_ops


class EmbeddingNet:
    """Base model class (``embedding_net/models.py:22``)."""

    def __init__(self, params, training: bool = False):
        self.params = params
        self.params_model = params["model"]
        self.params_dataloader = params["dataloader"]
        self.params_generator = params["generator"]
        self.params_general = params["general"]
        self.params_train = params["train"]
        self.params_softmax = params.get("softmax")

        self.workdir_path = os.path.join(self.params_general["work_dir"],
                                         self.params_general["project_name"])
        self.encoded_training_data: Dict[str, Any] = {}
        self.training = training

        self.module: Optional[EmbeddingModule] = None
        self.variables = None
        self._encode_jit = None
        self._create_base_model()

    # -- construction ------------------------------------------------------

    def _create_base_model(self):
        m = self.params_model
        # ArcFace trains cosine structure only (the loss normalizes
        # internally); retrieval must therefore be on the hypersphere —
        # unnormalized L2-kNN degrades as the margin loss saturates and
        # embedding norms drift (measured: recall@1 peaks then collapses
        # while train loss keeps falling). Normalization is a param-free
        # op, so the same checkpoint loads either way.
        normalize = bool(m["embeddings_normalization"]
                         or m.get("mode") == "arcface")
        self.module = EmbeddingModule(
            backbone_name=m["backbone_name"],
            encodings_len=m["encodings_len"],
            embeddings_normalization=normalize)
        rng = jax.random.PRNGKey(self.params_general.get("seed", 42))
        dummy = jnp.zeros((1,) + tuple(m["input_shape"]), jnp.float32)
        self.variables = self.module.init({"params": rng, "dropout": rng},
                                          dummy, train=False,
                                          method="init_all")
        self._encode_jit = jax.jit(
            lambda v, x: self.module.apply(v, x, train=False))

    @property
    def input_shape(self):
        return tuple(self.params_model["input_shape"])

    # -- encoding ----------------------------------------------------------

    def encode(self, images: np.ndarray) -> np.ndarray:
        """uint8/float [B, H, W, 3] BGR batch -> embeddings [B, D].

        Normalizes ``/255.`` exactly like the training path
        (``datagenerators.py:156``).
        """
        x = jnp.asarray(images, jnp.float32) / 255.0
        return np.asarray(self._encode_jit(self.variables, x))

    def _generate_encodings(self, imgs: np.ndarray) -> np.ndarray:
        return self.encode(imgs)

    def generate_encodings(self, data_loader, max_n_samples: int = 10,
                           shuffle: bool = True) -> Dict[str, Any]:
        """Per-class capped encoding DB (``models.py:61-84``); returns the
        same ``{'paths', 'labels', 'encodings'}`` contract."""
        data_paths, data_labels, data_encodings = [], [], []
        rng = random.Random(self.params_general.get("seed", 42))
        for class_name in data_loader.class_names:
            data_list = list(data_loader.train_data[class_name])
            if len(data_list) > max_n_samples:
                if shuffle:
                    rng.shuffle(data_list)
                data_list = data_list[:max_n_samples]
            if not data_list:
                continue
            imgs = get_images(data_list, self.input_shape)
            if imgs.size == 0:
                continue
            encods = self._generate_encodings(imgs)
            for path, encod in zip(data_list, encods):
                data_paths.append(path)
                data_labels.append(class_name)
                data_encodings.append(encod)
        encoded = {
            "paths": data_paths,
            "labels": data_labels,
            "encodings": np.squeeze(np.array(data_encodings)),
            # provenance: encodings are only valid with the weights that
            # produced them (mismatch silently predicts one class)
            "weights_fingerprint": self.weights_fingerprint(),
        }
        self.encoded_training_data = encoded
        return encoded

    def weights_fingerprint(self) -> str:
        """sha1 of the encoder variables, order-insensitive.

        Hashes (path, value-bytes) pairs sorted by path rather than the
        msgpack serialization: dict insertion order differs between a
        fresh ``module.init`` template and the Trainer's state tree, so
        hashing ``to_bytes`` directly made a legitimate save->load
        round-trip look like a weights mismatch. The ``classifier``
        subtree (the reference's Dense(1, sigmoid) head) is excluded:
        it plays no part in encodings, and arcface/siamese training
        exports the encoder view without it — a fresh-init classifier on
        the load side must not invalidate a matching encoder.
        """
        import hashlib
        import jax
        h = hashlib.sha1()
        leaves = [("/".join(str(getattr(k, "key", k)) for k in path),
                   np.asarray(leaf))
                  for path, leaf in
                  jax.tree_util.tree_leaves_with_path(self.variables)]
        # Exclude exactly the top-level 'classifier' module (path shape is
        # '<collection>/classifier/...'), not any path merely containing
        # the substring — a future head named e.g. 'embeddings_classifier'
        # must still be hashed.
        leaves = [(p, a) for p, a in leaves
                  if not (len(p.split("/")) >= 2
                          and p.split("/")[1] == "classifier")]
        for path, arr in sorted(leaves):
            h.update(path.encode())
            # dtype+shape folded in so reshaped/recast-but-identical-byte
            # trees cannot collide
            h.update(f"{arr.dtype}{arr.shape}".encode())
            h.update(np.ascontiguousarray(arr).tobytes())
        return h.hexdigest()[:16]

    def encode_dataset(self, paths, batch_size: int = 256,
                       num_workers: int = 8) -> np.ndarray:
        """High-throughput bulk encoding: threaded/native decode pipeline
        feeding fixed-size jitted encode batches (pads the tail so one
        compiled program serves every batch). The production-scale path
        that ``generate_encodings``'s per-class loop (reference semantics,
        ``models.py:61-84``) is not."""
        from embeddingnet_tpu.data.pipeline import BatchLoader

        class _ListSampler:
            def __init__(self, paths):
                self.paths = paths

            def __iter__(self):
                for start in range(0, len(self.paths), batch_size):
                    chunk = self.paths[start:start + batch_size]
                    yield chunk, np.zeros(len(chunk), np.int32)

        loader = BatchLoader(_ListSampler(paths), self.input_shape,
                             num_workers=num_workers)
        out = []
        for images, _ in loader:
            n = images.shape[0]
            if n < batch_size:  # pad tail to the compiled shape
                pad = np.zeros((batch_size - n,) + images.shape[1:],
                               images.dtype)
                images = np.concatenate([images, pad])
            out.append(self.encode(images)[:n])
        return np.concatenate(out) if out else np.zeros(
            (0, self.params_model["encodings_len"]), np.float32)

    def save_encodings(self, encoded_training_data,
                       save_folder: str = "./",
                       save_file_name: str = "encodings.pkl"):
        """Pickle the DB (``models.py:86-90``) — same file contract."""
        with open(os.path.join(save_folder, save_file_name), "wb") as f:
            pickle.dump(encoded_training_data, f)

    def load_encodings(self, path_to_encodings: str):
        """The method ``tools/test.py:22`` calls but the reference never
        defined (it was a loose function, ``utils.py:29-33``)."""
        with open(path_to_encodings, "rb") as f:
            self.encoded_training_data = pickle.load(f)
        fp = self.encoded_training_data.get("weights_fingerprint")
        if fp is not None and fp != self.weights_fingerprint():
            import warnings
            warnings.warn(
                "encodings DB was produced by different weights than the "
                "loaded model (fingerprint mismatch) — predictions will be "
                "meaningless; re-run generate_encodings or load the "
                "matching base_model", stacklevel=2)
        return self.encoded_training_data

    # -- classifier over encodings ----------------------------------------

    def train_embeddings_classifier(self, data_loader, classification_model,
                                    max_n_samples: int = 10,
                                    shuffle: bool = True):
        """Fit an sklearn-style classifier on the DB (``models.py:52-59``)."""
        encodings = self.generate_encodings(data_loader,
                                            max_n_samples=max_n_samples,
                                            shuffle=shuffle)
        classification_model.fit(encodings["encodings"], encodings["labels"])
        self.encoded_training_data["knn_classifier"] = classification_model
        return classification_model

    # -- inference ---------------------------------------------------------

    def _load_query(self, image) -> np.ndarray:
        import cv2
        if isinstance(image, str):
            img = cv2.imread(image)
            if img is None:
                raise FileNotFoundError(f"image does not exist: {image}")
        else:
            img = image
        img = cv2.resize(img, (self.input_shape[0], self.input_shape[1]))
        return img[None]

    def _db(self):
        db = self.encoded_training_data
        if not db:
            raise RuntimeError(
                "no encodings loaded; call generate_encodings or "
                "load_encodings first")
        labels = db["labels"]
        classes = sorted(set(labels))
        class_to_id = {c: i for i, c in enumerate(classes)}
        label_ids = np.array([class_to_id[l] for l in labels], np.int32)
        return np.asarray(db["encodings"], np.float32), label_ids, classes

    def predict(self, image) -> str:
        """Nearest-neighbor label (``models.py:115-126``, with the missing
        ``calculate_distances`` implemented as argmin over the DB)."""
        emb = self.encode(self._load_query(image))
        db_emb, label_ids, classes = self._db()
        d2 = np.sum((db_emb - emb) ** 2, axis=1)
        return self.encoded_training_data["labels"][int(np.argmin(d2))]

    def predict_knn(self, image, with_top5: bool = False):
        """kNN vote on device (``models.py:128-142``); ``knn_k`` comes from
        the ENCODINGS config section (parsed-but-unused in the reference)."""
        emb = self.encode(self._load_query(image))
        db_emb, label_ids, classes = self._db()
        k = int(self.params.get("encodings", {}).get("knn_k", 1) or 1)
        pred, _ = knn_ops.knn_classify(jnp.asarray(db_emb),
                                       jnp.asarray(label_ids),
                                       jnp.asarray(emb), k=k,
                                       n_classes=len(classes))
        predicted_label = classes[int(pred[0])]
        if with_top5:
            _, idx5 = knn_ops.knn_neighbors(jnp.asarray(db_emb),
                                            jnp.asarray(emb),
                                            k=min(5, len(label_ids)))
            top5 = [self.encoded_training_data["labels"][int(i)]
                    for i in np.asarray(idx5[0])]
            return predicted_label, top5
        return predicted_label

    def calculate_prediction_accuracy(self, data_loader,
                                      batch_size: int = 256):
        """top-1 / top-5 over the val split (``models.py:144-161``),
        batched: one encode pass + one kNN program per batch instead of a
        per-image predict loop."""
        val_paths, val_labels = data_loader.flat("val")
        if not val_paths:
            return {"top1": 0.0, "top5": 0.0}
        db_emb, label_ids, classes = self._db()
        db_emb_j = jnp.asarray(db_emb)
        db_labels_j = jnp.asarray(label_ids)

        correct_top1 = 0
        correct_top5 = 0
        total = 0
        for start in range(0, len(val_paths), batch_size):
            chunk_paths = val_paths[start:start + batch_size]
            chunk_labels = val_labels[start:start + batch_size]
            imgs = get_images(chunk_paths, self.input_shape)
            if imgs.size == 0:
                continue
            emb = jnp.asarray(self.encode(imgs))
            k = min(5, len(label_ids))
            pred, _ = knn_ops.knn_classify(db_emb_j, db_labels_j, emb, k=1,
                                           n_classes=len(classes))
            _, idx5 = knn_ops.knn_neighbors(db_emb_j, emb, k=k)
            pred = np.asarray(pred)
            idx5 = np.asarray(idx5)
            for i, true_label in enumerate(chunk_labels):
                total += 1
                if classes[int(pred[i])] == true_label:
                    correct_top1 += 1
                top5 = {self.encoded_training_data["labels"][int(j)]
                        for j in idx5[i]}
                if true_label in top5:
                    correct_top5 += 1
        return {"top1": correct_top1 / max(total, 1),
                "top5": correct_top5 / max(total, 1)}

    # -- persistence -------------------------------------------------------

    def save_base_model(self, save_folder: str,
                        file_name: str = "base_model.msgpack"):
        """Serialize encoder variables + architecture config — the
        ``.h5``-equivalent (``models.py:105-106``)."""
        os.makedirs(save_folder, exist_ok=True)
        path = os.path.join(save_folder, file_name)
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(self.variables))
        meta = {
            "backbone_name": self.params_model["backbone_name"],
            "encodings_len": self.params_model["encodings_len"],
            "embeddings_normalization":
                self.params_model["embeddings_normalization"],
            "input_shape": list(self.input_shape),
        }
        with open(path + ".json", "w") as f:
            json.dump(meta, f)
        return path

    def load_model(self, file_path: str):
        """Restore encoder variables saved by :meth:`save_base_model`
        (``models.py:92-102`` equivalent).

        Merges into the fresh-init template with an explicit leniency
        allowlist: arcface/siamese training exports the *encoder view* of
        the param tree, which has no ``classifier`` subtree (the
        reference's Dense(1, sigmoid) head, unused in retrieval) — ONLY
        that subtree may be absent from the file and keep its fresh
        initialization. Any other missing subtree raises (a truncated or
        architecture-mismatched checkpoint must not silently yield a
        partially random encoder), and saved keys that don't exist in the
        template warn.
        """
        with open(file_path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())

        # Missing-subtree leniency is restricted to the classifier head
        # directly under a variable collection ('params/classifier', ...).
        def _lenient(path):
            return len(path) == 2 and path[1] == "classifier"

        def merge(template, saved, path=()):
            if not isinstance(template, dict):
                return saved
            if not isinstance(saved, dict):
                raise ValueError(
                    f"checkpoint structure mismatch at {'/'.join(path)}: "
                    f"expected a subtree, file has a leaf")
            extra = set(saved) - set(template)
            if extra:
                import warnings
                warnings.warn(
                    f"checkpoint has keys not in the model at "
                    f"{'/'.join(path) or '<root>'}: {sorted(extra)} — "
                    f"ignored", stacklevel=2)
            out = {}
            for k, v in template.items():
                child = path + (k,)
                if k in saved:
                    out[k] = merge(v, saved[k], child)
                elif _lenient(child):
                    out[k] = v  # encoder-view export: fresh head is fine
                else:
                    raise KeyError(
                        f"checkpoint is missing required subtree "
                        f"'{'/'.join(child)}' — wrong architecture or "
                        f"truncated file ({file_path})")
            return out

        self.variables = merge(self.variables, raw)
        return self

    def save_stablehlo(self, save_folder: str,
                       save_name: str = "base_model.stablehlo"):
        """Portable compiled-graph export — the ONNX-export analog
        (``models.py:108-113``) in the XLA ecosystem's exchange format."""
        from jax import export as jax_export
        os.makedirs(save_folder, exist_ok=True)
        x = jnp.zeros((1,) + self.input_shape, jnp.float32)
        exported = jax_export.export(
            jax.jit(lambda img: self.module.apply(self.variables, img)))(x)
        path = os.path.join(save_folder, save_name)
        with open(path, "wb") as f:
            f.write(exported.serialize())
        return path

    # alias keeping the reference method name discoverable
    save_onnx = save_stablehlo


class TripletNet(EmbeddingNet):
    """Three shared-weight streams (``models.py:164-189``). In the
    functional design the streams *are* the same encoder applied to a
    [3B] batch; ``merged_forward`` reproduces the concatenated
    ``[enc_a || enc_p || enc_n]`` output surface."""

    def merged_forward(self, anchors, positives, negatives) -> np.ndarray:
        embs = [self.encode(x) for x in (anchors, positives, negatives)]
        return np.concatenate(embs, axis=-1)


class SiameseNet(EmbeddingNet):
    """Two shared streams + distance head (``models.py:192-236``)."""

    def __init__(self, params, training: bool = False):
        super().__init__(params, training)
        self.distance_type = self.params_model["distance_type"]
        if self.distance_type == "l1":
            from embeddingnet_tpu.models.heads import SiameseL1Head
            self.l1_head = SiameseL1Head()
            rng = jax.random.PRNGKey(self.params_general.get("seed", 42))
            d = self.params_model["encodings_len"]
            self.l1_head_variables = self.l1_head.init(
                rng, jnp.zeros((1, d)), jnp.zeros((1, d)))

    def pair_forward(self, images_1, images_2):
        """Distance output for a pair batch: l1 -> Dense-sigmoid score,
        l2 -> euclidean distance (``models.py:217-228``)."""
        e1 = jnp.asarray(self.encode(images_1))
        e2 = jnp.asarray(self.encode(images_2))
        if self.distance_type == "l1":
            return np.asarray(self.l1_head.apply(self.l1_head_variables,
                                                 e1, e2))
        from embeddingnet_tpu.models.heads import siamese_l2_distance
        return np.asarray(siamese_l2_distance(e1, e2))
