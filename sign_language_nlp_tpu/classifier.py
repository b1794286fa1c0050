"""SignClassifier — the estimator facade.

The reference's user-facing estimator is a skorch `NeuralNetClassifier`
(reference main.py:44): `.fit(X, y)`, `.predict(X)`,
`.predict_proba(X)` with softmax over the (log-prob) module output, and
sklearn-scorer compatibility. This facade provides that surface over
the population engine (a single fit is a population of one), so library
users migrating from the reference keep their calling code.

    clf = SignClassifier(model="model.Transformer", dataset=ds,
                         lr=0.01, max_epochs=50, batch_size=50)
    clf.fit(train)                       # an AslDataset (or row indices)
    y_hat = clf.predict(test)
    p = clf.predict_proba(test)
    clf.save(workdir) / SignClassifier.load(workdir, dataset=ds)
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .data import AslDataset
from .models.registry import build_model
from .search.kfold import train_valid_split
from .training.engine import PopulationTrainer, TrainConfig, TrainTask


class SignClassifier:
    def __init__(self, model: str, dataset: AslDataset,
                 lr: float = 0.01, max_epochs: int = 10,
                 batch_size: int = 50, model_args: Optional[dict] = None,
                 optimizer: str = "torch.optim.SGD",
                 optimizer_args: Optional[dict] = None,
                 criterion: str = "torch.nn.CrossEntropyLoss",
                 early_stopping: Optional[dict] = None,
                 gradient_clipping: Optional[dict] = None,
                 lr_scheduler: Optional[dict] = None,
                 scoring=("accuracy",), seed: int = 0,
                 compat_args: Optional[dict] = None,
                 precision_args: Optional[dict] = None, verbose: int = 1):
        self.model_name = model
        self.model_args = dict(model_args or {})
        self.compat_args = dict(compat_args or {})
        self.precision_args = dict(precision_args or {})
        self.dataset = dataset
        self.lr = float(lr)
        self.dropout = float(self.model_args.get("dropout") or 0.0)
        self.module = build_model(
            model, len(dataset.src_vocab), len(dataset.tgt_vocab),
            dataset.src_vocab.pad_index, dataset.tgt_vocab.pad_index,
            model_args=self.model_args, compat_args=compat_args,
            precision_args=precision_args)
        self.config = TrainConfig(
            optimizer=optimizer, optimizer_args=optimizer_args or {},
            criterion=criterion, batch_size=batch_size,
            max_epochs=max_epochs, gradient_clipping=gradient_clipping,
            lr_scheduler=lr_scheduler, early_stopping=early_stopping,
            scoring=tuple(scoring), seed=seed, verbose=verbose)
        self.trainer = PopulationTrainer(
            self.module, dataset.tgt_vocab.pad_index,
            len(dataset.tgt_vocab), self.config)
        self.params_: Optional[dict] = None
        self.history_: Optional[dict] = None

    # ------------------------------------------------------------- helpers
    def _rows(self, data) -> np.ndarray:
        if data is None:
            return np.arange(len(self.dataset))
        if isinstance(data, AslDataset):
            raise ValueError(
                "pass row indices into the constructor dataset, or use "
                "fit_dataset()/predict_dataset() for standalone datasets")
        return np.asarray(data)

    def _arrays(self, dataset: AslDataset):
        return (dataset.tokens, dataset.lengths, dataset.labels_idx)

    # ----------------------------------------------------------------- fit
    def fit(self, rows=None) -> "SignClassifier":
        """Train on `rows` (indices into the constructor dataset; default
        all), with the skorch-style internal stratified train/valid
        monitor split."""
        rows = self._rows(rows)
        y = self.dataset.labels_idx[rows]
        inner_tr, inner_va = train_valid_split(y, n_splits=5)
        task = TrainTask(train_rows=[rows[inner_tr]],
                         valid_rows=[rows[inner_va]],
                         lr=np.asarray([self.lr], np.float32),
                         dropout=np.asarray([self.dropout], np.float32))
        out = self.trainer.fit(self._arrays(self.dataset), task)
        self.params_ = out["params"]
        self.history_ = out["history"]
        return self

    def fit_dataset(self, dataset: AslDataset) -> "SignClassifier":
        self.dataset = dataset
        return self.fit(np.arange(len(dataset)))

    # ------------------------------------------------------------- predict
    def decision_function(self, rows=None) -> np.ndarray:
        """Log-prob outputs [N, V] (the module's forward)."""
        assert self.params_ is not None, "call fit() first"
        rows = self._rows(rows)
        log_probs, w = self.trainer.predict_log_probs(
            self.params_, self._arrays(self.dataset), [rows])
        m = int(w[0].sum())
        return np.asarray(log_probs[0][:m])

    def predict(self, rows=None) -> np.ndarray:
        return np.argmax(self.decision_function(rows), axis=-1)

    def predict_proba(self, rows=None) -> np.ndarray:
        """Softmax over the module output — skorch
        predict_nonlinearity='auto' semantics with a CE criterion."""
        out = self.decision_function(rows)
        e = np.exp(out - out.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    def predict_signs(self, rows=None) -> list:
        """Predicted gloss strings (decoded via the target vocab)."""
        itos = self.dataset.tgt_vocab.itos
        return [itos[i] for i in self.predict(rows)]

    def score(self, rows=None) -> float:
        rows = self._rows(rows)
        y = self.dataset.labels_idx[rows]
        return float((self.predict(rows) == y).mean())

    # ------------------------------------------------------------- persist
    def save(self, workdir: str, name: str = "params") -> str:
        from .training.checkpoint import save_checkpoint

        assert self.params_ is not None, "call fit() first"
        return save_checkpoint(workdir, self.params_, {
            "model": self.model_name, "model_args": self.model_args,
            "compat_args": self.compat_args,
            "precision_args": self.precision_args,
            "lr": self.lr}, name=name)

    @classmethod
    def load(cls, workdir: str, dataset: AslDataset,
             name: str = "params", **kwargs) -> "SignClassifier":
        from .training.checkpoint import load_checkpoint, load_descriptor

        desc = load_descriptor(workdir, name)
        clf = cls(model=desc["model"], dataset=dataset,
                  model_args=desc.get("model_args"),
                  compat_args=kwargs.pop("compat_args", None)
                  or desc.get("compat_args"),
                  precision_args=kwargs.pop("precision_args", None)
                  or desc.get("precision_args"),
                  lr=desc.get("lr", 0.01), **kwargs)
        # Materialize a template with the right structure, then restore:
        import jax

        sample = (dataset.tokens[:2], dataset.lengths[:2],
                  dataset.labels_idx[:2])
        template, _ = clf.trainer.init_population(
            tuple(map(np.asarray, sample)), 1, 0)
        clf.params_ = load_checkpoint(workdir,
                                      jax.tree.map(np.asarray, template),
                                      name=name)
        return clf
