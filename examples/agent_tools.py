"""Tool-use agent loop against the local server (the flow `unsloth
start claude|codex` wires an agent into — reference:
unsloth_cli/commands/start.py). Works over any of the three APIs;
shown here with OpenAI /v1/chat/completions:

1. send the user turn + tool definitions,
2. if the model answers with tool_calls, run the tools,
3. send the results back as role:"tool" turns, repeat until a plain
   answer arrives.

Start a server first:  unsloth serve --model_name MODEL
"""

import json
import urllib.request

BASE = "http://127.0.0.1:8000"

TOOLS = [{
    "type": "function",
    "function": {
        "name": "get_weather",
        "description": "Current weather for a city",
        "parameters": {
            "type": "object",
            "properties": {"city": {"type": "string"}},
            "required": ["city"],
        },
    },
}]


def get_weather(city: str) -> str:
    return json.dumps({"city": city, "temp_f": 72, "sky": "sunny"})


def chat(messages):
    req = urllib.request.Request(
        BASE + "/v1/chat/completions",
        data=json.dumps({"messages": messages, "tools": TOOLS,
                         "max_tokens": 256, "temperature": 0}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())["choices"][0]


messages = [{"role": "user", "content": "What's the weather in SF?"}]
while True:
    choice = chat(messages)
    msg = choice["message"]
    messages.append(msg)
    if choice["finish_reason"] != "tool_calls":
        print(msg["content"])
        break
    for tc in msg["tool_calls"]:
        args = json.loads(tc["function"]["arguments"])
        result = {"get_weather": get_weather}[tc["function"]["name"]](**args)
        messages.append({"role": "tool", "tool_call_id": tc["id"],
                         "content": result})
