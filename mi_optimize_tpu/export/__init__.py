from .checkpoint import CalibrationJournal, load_model, save_model  # noqa: F401
