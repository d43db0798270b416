from .ctrl import AttnCtrl, SiteKey, NO_CTRL

__all__ = ['AttnCtrl', 'SiteKey', 'NO_CTRL']
