from vila_tpu.export.hf_remote import export_hf_repo  # noqa: F401
