from .generator import CorpusSpec, generate_corpus  # noqa: F401
