from .meters import AverageMeter, text_bargraph

__all__ = ["AverageMeter", "text_bargraph"]
