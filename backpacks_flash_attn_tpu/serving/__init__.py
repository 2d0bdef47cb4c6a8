from . import engine, scheduler
