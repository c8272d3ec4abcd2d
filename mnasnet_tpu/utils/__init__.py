from mnasnet_tpu.utils.meters import AverageMeter, ProgressMeter  # noqa: F401
