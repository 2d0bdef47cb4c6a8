from . import backpack, gpt
