"""Ground truth for the third-party corpus (thirdparty.py): 64 retrieval
+ 10 rejection queries, hand-authored against text NOBODY on this project
wrote (CPython reference topics + pygame API docs). This split measures
generalization: the encoder/judge never saw this register at training time
and the queries were written by reading the rendered pages, exactly as the
reference's real-PDF ground truth was
(/root/reference/eval/ground_truth/queries.jsonl).

Report-only like the held-out split: never used by sweeps or adoption
decisions.
"""

# (query, doc, page 1-based, difficulty, expected_answer_gist)
THIRDPARTY_QUERIES = [
    # ---- python_ref_assignment ----
    ("What happens when an assignment target list has one name marked "
     "with a star?",
     "python_ref_assignment.pdf", 3, "easy",
     "starred target takes the leftover items; iterable must be long "
     "enough"),
    ("When an attribute appears on both sides of an assignment, which "
     "attribute does the right-hand side read?",
     "python_ref_assignment.pdf", 5, "hard",
     "a.x on the RHS may access either instance or class attribute"),
    # ---- python_ref_booleans ----
    ("Do Python's logical operators always return True or False?",
     "python_ref_booleans.pdf", 2, "easy",
     "no — they return the last evaluated argument"),
    # ---- python_ref_calls ----
    ("In what order are keyword arguments matched to a function's "
     "parameters during a call?",
     "python_ref_calls.pdf", 3, "medium",
     "converted to positionals via a list of unfilled slots"),
    ("What error do I get for a keyword argument that matches no "
     "parameter, and what suppresses it?",
     "python_ref_calls.pdf", 5, "medium",
     "TypeError unless a **identifier parameter is present"),
    # ---- python_ref_class ----
    ("In what kind of namespace does a class body execute?",
     "python_ref_class.pdf", 2, "medium",
     "a newly created local namespace in a new frame"),
    ("Why do all instances of my class see the same list when I defined "
     "it in the class body?",
     "python_ref_class.pdf", 4, "medium",
     "class-body variables are class attributes shared by instances"),
    # ---- python_ref_comparisons ----
    ("Does writing x < y > z compare x with z?",
     "python_ref_comparisons.pdf", 2, "easy",
     "no — chained comparisons imply nothing between a and c"),
    ("Which comparison behavior do all types inherit by default, and from "
     "what?",
     "python_ref_comparisons.pdf", 3, "medium",
     "default identity-based equality inherited from object"),
    ("Why does sorting a list containing NaN values produce surprising "
     "results?",
     "python_ref_comparisons.pdf", 5, "medium",
     "any ordered comparison with NaN is false"),
    # ---- python_ref_context_managers ----
    ("Which object's methods define the runtime context a with statement "
     "establishes?",
     "python_ref_context_managers.pdf", 1, "easy",
     "the context manager's enter/exit methods"),
    ("What arguments does the context exit method receive when the block "
     "raises?",
     "python_ref_context_managers.pdf", 2, "medium",
     "the exception details that caused the exit"),
    # ---- python_ref_debugger ----
    ("What does the standard debugger module do when a program it runs "
     "exits abnormally?",
     "python_ref_debugger.pdf", 3, "medium",
     "automatically enters post-mortem debugging"),
    ("Which debugger function evaluates an expression under debugger "
     "control and hands back its value?",
     "python_ref_debugger.pdf", 5, "medium",
     "runeval() returns the expression's value"),
    # ---- python_ref_dict ----
    ("What syntax difference separates a dict comprehension from list and "
     "set comprehensions?",
     "python_ref_dict.pdf", 2, "easy",
     "it needs two expressions separated by a colon"),
    # ---- python_ref_exceptions ----
    ("Can an exception handler resume execution at the point where the "
     "error was raised?",
     "python_ref_exceptions.pdf", 2, "medium",
     "no — Python uses the termination model"),
    # ---- python_ref_for ----
    ("Does the loop variable keep its value after the loop finishes?",
     "python_ref_for.pdf", 2, "medium",
     "the for-loop's assignments overwrite and persist"),
    # ---- python_ref_formatstrings ----
    ("Inside a format placeholder, what can the field name start with?",
     "python_ref_formatstrings.pdf", 3, "easy",
     "an arg_name: a number (positional) or keyword"),
    ("Which three conversion flags can precede a format spec, and what "
     "does each call?",
     "python_ref_formatstrings.pdf", 5, "medium",
     "!s str(), !r repr(), !a ascii()"),
    # ---- python_ref_function ----
    ("When exactly are default parameter values evaluated?",
     "python_ref_function.pdf", 4, "easy",
     "once, left to right, when the def executes"),
    ("What does executing a def statement actually bind?",
     "python_ref_function.pdf", 2, "medium",
     "the function name to a function object in the local namespace"),
    # ---- python_ref_identifiers ----
    ("How can match and case be keywords without breaking code that uses "
     "them as variable names?",
     "python_ref_identifiers.pdf", 4, "medium",
     "they are soft keywords, special only in the grammar contexts"),
    ("What two common uses does the bare underscore name have?",
     "python_ref_identifiers.pdf", 5, "medium",
     "internationalization via gettext and throwaway names"),
    # ---- python_ref_import ----
    ("After `import foo.bar.baz`, which name is actually bound in my "
     "namespace?",
     "python_ref_import.pdf", 4, "medium",
     "foo is bound locally; the submodules are imported"),
    ("How does a module control which names a star-import exposes?",
     "python_ref_import.pdf", 5, "easy",
     "__all__ lists the public names"),
    # ---- python_ref_naming ----
    ("What makes a variable local to a block versus global?",
     "python_ref_naming.pdf", 2, "easy",
     "binding inside the block, unless declared nonlocal/global"),
    ("I read a variable before assigning it inside a function and got a "
     "DIFFERENT error than plain NameError — why?",
     "python_ref_naming.pdf", 3, "medium",
     "unbound local: the name is local but not yet bound"),
    ("Where does a nonlocal declaration make names resolve to?",
     "python_ref_naming.pdf", 5, "medium",
     "previously bound variables in the nearest enclosing function scope"),
    # ---- python_ref_objects ----
    ("What three things does every Python object have?",
     "python_ref_objects.pdf", 1, "medium",
     "identity, type, value (objects are the data abstraction)"),
    ("Why shouldn't I rely on garbage collection to close my open files?",
     "python_ref_objects.pdf", 4, "medium",
     "external resources free only when collected; use explicit close"),
    ("Is `a is b` guaranteed false for two separately computed equal "
     "tuples?",
     "python_ref_objects.pdf", 5, "hard",
     "immutable types may or may not reuse identical objects"),
    # ---- python_ref_operator_summary ----
    ("Where can I find Python's full operator binding-strength table?",
     "python_ref_operator_summary.pdf", 1, "easy",
     "the operator precedence summary, highest to lowest"),
    ("Why might abs(x % y) come out >= abs(y) for floats?",
     "python_ref_operator_summary.pdf", 3, "hard",
     "roundoff breaks the mathematical identity"),
    # ---- python_ref_sequence_types ----
    ("Which special method implements len(), and what must it return?",
     "python_ref_sequence_types.pdf", 2, "easy",
     "__len__ returning an integer >= 0"),
    ("What key does a[1:2] = b actually pass to the container's item "
     "assignment?",
     "python_ref_sequence_types.pdf", 3, "medium",
     "a slice(1, 2, None) object"),
    # ---- python_ref_slicings ----
    ("Through which method is a slicing of a sequence ultimately "
     "performed?",
     "python_ref_slicings.pdf", 2, "medium",
     "__getitem__ with a key built from the slice list"),
    # ---- python_ref_string_methods ----
    ("What's the more aggressive cousin of lowercasing for caseless "
     "string comparison?",
     "python_ref_string_methods.pdf", 2, "easy",
     "casefold"),
    ("Counting an empty substring in a string returns what?",
     "python_ref_string_methods.pdf", 3, "hard",
     "length plus one (empty strings between characters)"),
    ("Can endswith check several possible suffixes in one call?",
     "python_ref_string_methods.pdf", 4, "easy",
     "yes — suffix can be a tuple"),
    # ---- python_ref_try ----
    ("When no error occurs in a try block, what happens to its except "
     "clauses?",
     "python_ref_try.pdf", 2, "easy",
     "no handler is executed"),
    ("Why can't I use my caught exception variable after the except "
     "block ends?",
     "python_ref_try.pdf", 4, "medium",
     "the name is cleared; rebind it to keep the exception"),
    ("What changes about except matching when the star form is used?",
     "python_ref_try.pdf", 5, "medium",
     "except* handles ExceptionGroups"),
    # ---- python_ref_typesmapping ----
    ("List three different expressions that construct the same "
     "three-entry dictionary.",
     "python_ref_typesmapping.pdf", 3, "easy",
     "dict(one=1,...), literal, dict(zip(...)), etc."),
    ("What hook runs when subscripting a dict subclass with a missing "
     "key?",
     "python_ref_typesmapping.pdf", 4, "medium",
     "__missing__ is called with the key"),
    # ---- python_ref_typesseq ----
    ("How are two lists compared by the < operator?",
     "python_ref_typesseq.pdf", 3, "easy",
     "lexicographically, element by element"),
    ("After s * 3, do I get three copies of the items?",
     "python_ref_typesseq.pdf", 4, "medium",
     "no — items are referenced multiple times, not copied"),
    ("What happens to a slice bound larger than the sequence length?",
     "python_ref_typesseq.pdf", 5, "easy",
     "it is clamped to len(s)"),
    # ---- python_ref_with ----
    ("If the context's enter method succeeds, what is guaranteed about "
     "exit?",
     "python_ref_with.pdf", 2, "medium",
     "__exit__ will always be called"),
    ("What is the documented desugaring of a with statement?",
     "python_ref_with.pdf", 3, "medium",
     "manager/enter/exit lookup then try/finally equivalent"),

    # ---- pygame refs ----
    ("How many display surfaces can a pygame program have at once?",
     "pygame_ref_display.pdf", 1, "easy",
     "a single display Surface, windowed or fullscreen"),
    ("Which event arrives when the user asks a pygame window to close?",
     "pygame_ref_display.pdf", 3, "easy",
     "pygame.QUIT on the event queue"),
    ("Is calling the display module's init twice a problem?",
     "pygame_ref_display.pdf", 5, "easy",
     "harmless; repeated calls have no effect"),
    ("How can many sequential shape-drawing calls be sped up?",
     "pygame_ref_draw.pdf", 2, "medium",
     "lock and unlock the surface once around them"),
    ("Below what circle radius does pygame draw nothing?",
     "pygame_ref_draw.pdf", 4, "medium",
     "radius less than 1 draws nothing"),
    ("When drawing a thick rectangle outline, which direction do the "
     "edge lines grow?",
     "pygame_ref_draw.pdf", 5, "medium",
     "only inward from the original boundary"),
    ("Besides the queue, how else can I read input device state in "
     "pygame?",
     "pygame_ref_event.pdf", 2, "easy",
     "access devices directly via their modules"),
    ("What two things does every pygame event instance carry?",
     "pygame_ref_event.pdf", 3, "easy",
     "a type identifier plus type-specific attributes"),
    ("Why should I write K_a instead of the raw integer 97 in my key "
     "handler?",
     "pygame_ref_key.pdf", 2, "medium",
     "key constant integers differ between pygame 1 and 2"),
    ("How do I test whether shift was held during a pygame key event?",
     "pygame_ref_key.pdf", 5, "medium",
     "the event's mod attribute is a bitmask of modifiers"),
    ("What does a negative size argument mean when initializing pygame "
     "audio?",
     "pygame_ref_mixer.pdf", 3, "medium",
     "negative means signed sample values"),
    ("Why do some platforms need the sound system initialized AFTER the "
     "window?",
     "pygame_ref_mixer.pdf", 4, "hard",
     "mixer must init after display on some platforms"),
    ("Do two pygame rectangles touching edge-to-edge overlap?",
     "pygame_ref_rect.pdf", 3, "medium",
     "no — the right/bottom edge pixels are not included"),
    ("How do I grow a rectangle while keeping its center fixed?",
     "pygame_ref_rect.pdf", 4, "easy",
     "inflate: size changes, stays centered"),
    ("How does the time module's frame limiter achieve its accuracy, and "
     "at what cost?",
     "pygame_ref_time.pdf", 4, "medium",
     "busy-loop delay burns CPU for accuracy"),
    ("Rotating a pygame image by 45 degrees changed its size — why?",
     "pygame_ref_transform.pdf", 3, "medium",
     "non-90-degree rotations pad the image larger"),
    ("How do I make background music repeat forever?",
     "pygame_ref_music.pdf", 2, "easy",
     "loops=-1 repeats indefinitely"),
]

# Nothing in the third-party corpus answers these (kept deliberately
# adjacent in register: Python/games/audio-flavored junk the gate must
# still reject).
THIRDPARTY_REJECTION_QUERIES = [
    "What default recursion limit does the Ruby interpreter ship with?",
    "How do I enable hot reloading in the Unity game engine's play mode?",
    "Which C++ standard introduced structured bindings?",
    "What sample rate does the Opus codec use internally?",
    "How many worker threads does Node.js's libuv pool create by "
    "default?",
    "What's the maximum texture size on an iPhone 15's GPU?",
    "Which PostgreSQL version added the MERGE statement?",
    "How do I pair a DualShock controller over Bluetooth on Windows?",
    "What frame rate does the PAL television standard use?",
    "Which keyboard shortcut toggles breakpoints in Visual Studio Code?",
]

assert len(THIRDPARTY_QUERIES) == 66, len(THIRDPARTY_QUERIES)
assert len(THIRDPARTY_REJECTION_QUERIES) == 10
