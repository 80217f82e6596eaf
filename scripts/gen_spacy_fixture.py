#!/usr/bin/env python
"""Generate the checked-in spacy tokenization fixture (run on a host WITH
spacy + en_core_web_sm; this image has neither).

Writes ``tests/data/spacy_fixture.json``: one entry per sentence with the
REAL ``en_core_web_sm`` tokenization, consumed by
``tests/test_tokenizer.py::test_regex_twin_matches_generated_spacy_fixture``
(skipped while the file is absent). The sentence list covers the caption
domain's long tail the 11-sentence inline rule fixture doesn't pin:
numerals, unicode letters, repeated tokens, contraction clusters,
possessives on plural/singular nouns, and the spacy exception list
(o'clock, cannot, gonna, ...).

Reference behavior being pinned: ``tokenization/tokenizers/spacy.py:13-58``
(word-level tokens of normalized caption text).

Usage (on a spacy-enabled host):
    python scripts/gen_spacy_fixture.py > tests/data/spacy_fixture.json
"""

from __future__ import annotations

import json
import sys

# Post-normalization caption-domain text: lowercase, punctuation stripped
# (apostrophes survive CleanPunctuation — normalizers.py PUNC_PATTERN).
SENTENCES = [
    # plain captions
    "a man is speaking while birds chirp in the background",
    "rain falls steadily on a tin roof",
    "an engine idles and then revs loudly",
    "water flows over rocks in a stream",
    "people are talking in a crowded room",
    "a dog barks twice and a car passes by",
    "wind blows through trees as leaves rustle",
    "footsteps echo in a long empty hallway",
    "someone is typing on a mechanical keyboard",
    "a door creaks open and slams shut",
    # contractions — suffix family
    "the dog isn't barking anymore",
    "don't stop the music now",
    "it's raining harder than before",
    "they're walking away slowly",
    "we've been waiting for the bus",
    "she'll sing when the crowd quiets",
    "i'd rather listen to the rain",
    "i'm hearing thunder in the distance",
    "you're standing near the fountain",
    "he's whistling a familiar tune",
    "that's the sound of a violin",
    "there's a train approaching the station",
    "what's making that buzzing noise",
    "who's knocking at the door",
    "doesn't the bell ring at noon",
    "wasn't the machine turned off",
    "aren't the birds quiet today",
    "couldn't hear the announcement clearly",
    "shouldn't the alarm have stopped",
    "wouldn't start despite the turning key",
    "won't stop beeping in the kitchen",
    "can't tell if the pump is running",
    "hadn't noticed the dripping faucet",
    "haven't heard a quieter engine",
    "hasn't stopped humming since morning",
    "weren't the speakers rattling earlier",
    "didn't the phone ring twice",
    # possessives
    "a man's dog barks at a woman's car",
    "the children's laughter fills the playground",
    "the bird's wings flap against the cage",
    "james's guitar twangs out of tune",
    "the workers' hammers strike in rhythm",
    # numerals (post-normalization integers; decimals lose their dot)
    "water drips 3 times into a metal bucket",
    "the clock strikes 12 and bells ring",
    "a 747 roars down the runway",
    "counting from 1 to 10 slowly",
    "about 100 people applaud at once",
    # spacy exception list / fused forms
    "the church bell rings at 5 o'clock",
    "the machine cannot run any faster",
    "gonna rain all day they said",
    "gotta close the window before the storm",
    "wanna hear the ocean waves",
    "lemme turn the volume down",
    "gimme a second to stop the recording",
    # unicode letters
    "a café crowd murmurs over clinking cups",
    "the naïve melody repeats on a music box",
    "señor lópez plays the piano softly",
    "the übermensch theme swells in brass",
    # repeated tokens
    "beep beep beep goes the alarm",
    "drip drip drip from the ceiling",
    "the drum goes boom boom boom",
    "tick tock tick tock goes the clock",
    # mixed / longer tail
    "someone's footsteps approach then fade away",
    "it isn't clear who's singing that song",
    "they've said it'll thunder before midnight",
    "we're sure he'd have heard the siren",
    "the cat's purring doesn't stop the dog's growling",
    "hammering nails into wood at 2 second intervals",
    "a woman says she's ready and laughs",
    "old engines don't idle this quietly",
    "you've got mail says the computer voice",
    "there're several birds calling at once",
    "a child counts 1 2 3 and giggles",
    "the mechanic's wrench clanks on concrete",
    "l'orchestre warms up behind the curtain",
    "o'clock chimes mark every passing hour",
    "the ship's horn sounds across the harbor",
    "spinning coins wobble then settle flat",
    "an mc announces the next performer",
    "a dj scratches a record rhythmically",
    "tv static hisses between channels",
    "the cd player skips on scratched discs",
    "airplane cabins hum at cruising altitude",
    "seagulls cry above the fish market",
    "a blacksmith's anvil rings with each strike",
    "thunderstorms roll in from the northwest",
    "crickets chirp throughout the summer night",
    "a kettle whistles until someone lifts it",
    "church organs resonate through stone arches",
    "the subway screeches into the station",
    "vendors shout prices over market noise",
    "rainwater gurgles down the storm drain",
    "a zipper opens and cloth rustles",
    "fireworks crackle and the crowd gasps",
    "bees buzz around the flowering hedge",
    "a modem dials with beeps and static",
    "horse hooves clop on cobblestone streets",
    "the referee's whistle halts the match",
    "glass bottles clink in the recycling bin",
    "an owl hoots somewhere in the dark forest",
    "waves crash against the wooden pier",
    "a chainsaw sputters then roars to life",
]


def main() -> int:
    try:
        import spacy
    except ImportError:
        print(
            "spacy not installed — run this on a spacy-enabled host",
            file=sys.stderr,
        )
        return 1
    nlp = spacy.load("en_core_web_sm")
    out = [
        {"text": s, "tokens": [t.text for t in nlp.tokenizer(s)]}
        for s in SENTENCES
    ]
    json.dump(out, sys.stdout, indent=1, ensure_ascii=False)
    print()
    return 0


if __name__ == "__main__":
    sys.exit(main())
