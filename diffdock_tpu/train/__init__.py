from diffdock_tpu.train.checkpoints import save_checkpoint, load_checkpoint

__all__ = ["save_checkpoint", "load_checkpoint"]
