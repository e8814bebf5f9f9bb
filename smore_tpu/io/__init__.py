from smore_tpu.io.embeddings import save_embeddings, load_embeddings  # noqa: F401
