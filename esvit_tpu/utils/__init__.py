from esvit_tpu.utils import schedules as schedules
