from .export import (export_fn, save_exported, load_exported,
                     export_pem_infer, pem_example_inputs,
                     export_sam_decode, export_dinov2_describe)

__all__ = ["export_fn", "save_exported", "load_exported",
           "export_pem_infer", "pem_example_inputs",
           "export_sam_decode", "export_dinov2_describe"]
