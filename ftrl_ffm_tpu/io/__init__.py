from ftrl_ffm_tpu.io.checkpoint import (
    export_reference_model,
    export_reference_text_model,
    import_reference_model,
    import_reference_text_model,
    load_checkpoint,
    save_checkpoint,
)

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "export_reference_model",
    "import_reference_model",
    "export_reference_text_model",
    "import_reference_text_model",
]
