from snuffy_tpu.ssl.schedules import cosine_iter_schedule
