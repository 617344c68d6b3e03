from .appflow import APPLICATIONS, Appflow, AppTask, register_task
