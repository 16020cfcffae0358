from .export import (export_fn, save_exported, load_exported,
                     export_pem_infer, pem_example_inputs)

__all__ = ["export_fn", "save_exported", "load_exported",
           "export_pem_infer", "pem_example_inputs"]
