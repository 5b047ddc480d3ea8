"""First-class CLI tools (dataset download, embedding prep, index build).

The reference ships these as notebooks (ref: notebooks/download_dataset.ipynb,
notebooks/embeddings_processing.ipynb, frontend/save_to_chromaDB.ipynb);
here they are installable console scripts (see pyproject.toml) with
repo-root shims under tools/ for the documented `python tools/<x>.py` form.
"""
