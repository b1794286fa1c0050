"""sign_language_nlp_tpu — a TPU-native sign-language-recognition framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``amorim-cleison/sign-language-nlp`` (reference mounted at /root/reference):
the ASL-Phono phonological-attribute pipeline, three seq2seq-style sign
classifiers (Transformer, LSTM+Bahdanau, GRU+Bahdanau), K-fold grid search,
and scored test evaluation with profiling — re-architected TPU-first.

The central design inversion (vs. the reference's Dask task farm,
reference helper.py:490-526, main.py:77): every (hyperparameter-candidate
× CV-fold) fit is independent, so the grid axis becomes a *vmapped
population axis* sharded over a ``jax.sharding.Mesh``. One jitted program
trains hundreds of fits in lockstep on the MXU instead of queueing
hundreds of tiny jobs.

Layout:
  config/    — declarative Argument schema + YAML/CLI merge (ref args.py)
  utils/     — logging, IO, hashing, workdir templating (ref commons-python)
  data/      — ASL-Phono builder, composition strategies, vocab, arrays
  models/    — Flax Transformer + recurrent enc-dec w/ Bahdanau attention
  ops/       — losses, sklearn-exact metrics, Pallas kernels
  training/  — vectorized population trainer (replaces skorch)
  search/    — grid enumeration, StratifiedKFold, search driver (replaces
               sklearn GridSearchCV + Dask)
  parallel/  — mesh construction, population sharding, multi-host fan-out
  profiling/ — jax.profiler + HLO cost-analysis reports (ref torch.profiler)
  native/    — C++ data-loading fast path (ctypes)
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import sign_language_nlp_tpu` free of
    jax/flax imports until actually used)."""
    if name == "AslDataset":
        from .data import AslDataset

        return AslDataset
    if name == "SignClassifier":
        from .classifier import SignClassifier

        return SignClassifier
    if name == "run":
        from .pipeline import run

        return run
    if name == "GridSearchDriver":
        from .search import GridSearchDriver

        return GridSearchDriver
    if name == "PopulationTrainer":
        from .training import PopulationTrainer

        return PopulationTrainer
    raise AttributeError(name)


__all__ = ["AslDataset", "SignClassifier", "run", "GridSearchDriver",
           "PopulationTrainer", "__version__"]
