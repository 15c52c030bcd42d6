from . import transforms, tps_aug, test_time_aug, extras
